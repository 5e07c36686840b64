"""Interactive session tests: scripted events drive Input → camera →
visible image change; runtime scene and material switching (the live-loop
behaviors of main.cpp:1131-1381)."""

import numpy as np
import pytest

from bibim_tpu.host.gui import UiState
from bibim_tpu.host.session import Session


def _session(**ui_kwargs):
    ui = UiState(**{"scene": "triangle", "enable_tone_mapping": True,
                    **ui_kwargs})
    return Session(width=128, height=64, ui=ui, readback_depth=1)


class TestEventReplay:
    def test_wasd_and_drag_change_the_image(self):
        script = [
            {"frame": 1, "key": "w", "down": True},
            {"frame": 3, "key": "w", "down": False},
            {"frame": 3, "mouse": True, "cursor": [0, 0]},
            {"frame": 4, "cursor": [30, -10]},
        ]
        s = _session()
        frames = list(s.run_script(script, n_frames=6, dt=0.1))
        assert len(frames) == 6
        # frame 0 = initial pose; W for 2 frames moved the camera forward;
        # the drag then rotated it. Each must change the rendering.
        assert not np.array_equal(frames[0], frames[2])
        assert not np.array_equal(frames[2], frames[5])
        # camera state followed main.cpp:1243-1262 exactly
        assert s.camera.pos[2] == pytest.approx(4.0 * 0.1 * 2)
        assert s.camera.yaw == pytest.approx(-30 * 0.6)
        assert s.camera.pitch == pytest.approx(10 * 0.6)

    def test_pitch_clamps_at_88_degrees(self):
        s = _session()
        s.handle_event({"mouse": True, "cursor": [0, 0]})
        s.render(0.1)
        s.handle_event({"cursor": [0, 1000]})
        s.render(0.1)
        assert s.camera.pitch == -88.0

    def test_live_resize_mid_script(self):
        """{"set": {"size": [w, h]}} rebuilds the reloadable resources
        mid-loop (onWindowResize analog, main.cpp:1042-1070): frames keep
        coming at the new extent."""
        script = [
            {"frame": 2, "set": {"size": [192, 96]}},
        ]
        s = _session()
        frames = list(s.run_script(script, n_frames=4, dt=0.1))
        assert len(frames) == 4
        assert frames[0].shape == (64, 128, 3)
        assert frames[1].shape == (64, 128, 3)
        assert frames[2].shape == (96, 192, 3)
        assert frames[3].shape == (96, 192, 3)
        # content survives the resize (same scene, still rendering)
        assert frames[3].max() > 0

    def test_hud_in_session_frames(self):
        """show_hud burns the stats line into session frames."""
        s = _session(show_hud=True)
        frames = list(s.run_script([], n_frames=2, dt=0.1))
        top = frames[-1][:24, :, :]
        assert (top == 255).all(axis=-1).any()


class TestRuntimeSwitching:
    def test_scene_switch_without_restart(self):
        script = [
            {"frame": 2, "set": {"scene": "gizmo"}},
        ]
        s = _session()
        frames = list(s.run_script(script, n_frames=4, dt=0.1))
        assert not np.array_equal(frames[1], frames[2])
        # both scenes stay constructed (lazy cache, main.cpp:1173-1182)
        # Keys are (name, instance-count) — the instance selector is part
        # of the scene identity (Session.scene).
        assert {k[0] for k in s._scenes} == {"triangle", "gizmo"}

    def test_material_switch_rebinds(self):
        s = _session(scene="shaderball")
        img0 = s.render(0.1)
        s.handle_event({"set": {"selected_material": 0}})
        img1 = s.render(0.1)
        assert 0 in s._materials and 1 in s._materials
        assert not np.array_equal(img0, img1)

    def test_ui_toggles_apply(self):
        s = _session()
        base = s.render(0.1)
        s.handle_event({"set": {"exposure": 8.0}})
        hot = s.render(0.1)
        assert hot.astype(int).sum() > base.astype(int).sum()

    def test_unknown_ui_field_rejected(self):
        s = _session()
        with pytest.raises(ValueError):
            s.handle_event({"set": {"nonsense": 1}})

    def test_aniso_toggle_reaches_settings(self):
        """The viewer/CLI aniso control (UiState.aniso_taps, clamped to
        1..16) flows into the live loop's RenderSettings — the opt-in
        surface for the reference sampler's maxAnisotropy=16
        (render.cpp:1355-1358; deviation documented in MIGRATION.md)."""
        s = _session()
        assert s.settings().aniso_taps == 1
        s.handle_event({"set": {"aniso_taps": 4}})
        assert s.settings().aniso_taps == 4
        s.handle_event({"set": {"aniso_taps": 99}})
        assert s.settings().aniso_taps == 16  # clamp
        s.handle_event({"set": {"aniso_taps": 0}})
        assert s.settings().aniso_taps == 1


def test_material_previews(tmp_path):
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.host.session import save_material_previews

    out = save_material_previews(
        create_pbr_material_set(), str(tmp_path / "mats.png"), tile=32
    )
    from PIL import Image

    sheet = np.asarray(Image.open(out))
    assert sheet.shape[1] == 6 * 32  # one column per PBR map
    assert sheet.any()


def test_mesh_scene_renders_user_asset():
    """Bring-your-own-asset path (Assimp import analog, main.cpp:216-283)."""
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.pipeline import (
        FrameParams, MaterialTextures, RenderSettings, ViewBlock,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera
    from bibim_tpu.scene.meshscene import MeshScene
    from bibim_tpu.utils.config import get_resource_root

    scene = MeshScene(path=str(get_resource_root().common("gizmo.obj")))
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, 2.0, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    tex = jnp.full((4, 4, 4), 180, jnp.uint8)
    mats = MaterialTextures(albedo=tex, metallic=tex, roughness=tex,
                            ao=tex, normal=tex, height=tex)
    out = render_frame(scene.scene_data(), vb, fp, mats, None,
                       RenderSettings(width=128, height=64, xla_cap=512,
                                      outputs="full"))
    assert (np.asarray(out["tri_id"]) >= 0).sum() > 20
