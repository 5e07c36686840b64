"""Host layer tests: UI state persistence, readback pipelining, camera."""

import numpy as np

from bibim_tpu.host.gui import UiState
from bibim_tpu.host.readback import DoubleBufferedReadback
from bibim_tpu.scene.camera import FreeLookCamera
from bibim_tpu.scene.input import Input
from bibim_tpu.utils.profiling import FrameStats


class TestUiState:
    def test_save_load_roundtrip(self, tmp_path):
        s = UiState(exposure=2.5, enable_tone_mapping=True, camera_yaw=33.0,
                    camera_pos=(1.0, 2.0, 3.0))
        p = tmp_path / "state.json"
        s.save(p)
        s2 = UiState.load(p)
        assert s2 == s

    def test_clamps(self):
        s = UiState(exposure=99.0, camera_pitch=120.0)
        s.clamp()
        assert s.exposure == 10.0 and s.camera_pitch == 88.0


class TestReadback:
    def test_two_frames_in_flight(self):
        rb = DoubleBufferedReadback(depth=2)
        assert rb.submit(np.zeros(1)) is None  # pipeline filling
        out = rb.submit(np.ones(1))
        assert out is not None and out[0] == 0  # oldest frame comes back
        rest = rb.flush()
        assert len(rest) == 1 and rest[0][0] == 1


class TestCameraInput:
    def test_mouse_sensitivity_and_clamp(self):
        cam = FreeLookCamera()
        cam.apply_mouse_drag(10, 0)  # 0.6 deg/px (main.cpp:1238)
        assert np.isclose(cam.yaw, -6.0)
        cam.apply_mouse_drag(0, -1000)
        assert cam.pitch == 88.0  # clamp (main.cpp:1241)

    def test_wasd_direction(self):
        inp = Input()
        inp.process_key_event("w", True)
        inp.process_key_event("d", True)
        assert inp.movement_direction() == (1, 1)
        inp.process_key_event("w", False)
        assert inp.movement_direction() == (1, 0)

    def test_movement_speed(self):
        cam = FreeLookCamera()  # looking +Z
        cam.apply_movement(0, 1, dt=0.5)  # 4 u/s forward (main.cpp:1259)
        np.testing.assert_allclose(cam.pos, [0, 0, 2.0], atol=1e-6)


class TestFrameStats:
    def test_rolling(self):
        fs = FrameStats(window=4)
        fs.tick()
        for _ in range(5):
            fs.tick()
        assert fs.ms_per_frame >= 0.0 and fs.fps >= 0.0
