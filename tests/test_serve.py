"""Live-viewer tests: the MJPEG present loop + browser-event path
(host/serve.py — the reference's window/present analog,
main.cpp:192-196, 1367-1380), served against a real Session."""

import json
import time
import urllib.request
from io import BytesIO

import numpy as np
import pytest
from PIL import Image

from bibim_tpu.host.gui import UiState
from bibim_tpu.host.serve import FrameHub, ViewerServer, encode_frame_jpeg
from bibim_tpu.host.session import Session


def _decode(data: bytes) -> np.ndarray:
    return np.asarray(Image.open(BytesIO(data)).convert("RGB"))


class TestEncode:
    def test_jpeg_roundtrip(self):
        """A smooth gradient survives JPEG encode within quantization
        error, through whichever encoder (native libjpeg or PIL) is
        live."""
        y, x = np.mgrid[0:64, 0:96]
        img = np.stack([x * 2, y * 3, x + y], -1).astype(np.uint8)
        data = encode_frame_jpeg(img, quality=95)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        back = _decode(data)
        assert back.shape == img.shape
        assert np.abs(back.astype(int) - img.astype(int)).mean() < 4

    def test_native_and_pil_encoders_agree(self):
        from bibim_tpu import native

        img = np.zeros((32, 48, 3), np.uint8)
        img[8:24, 12:36] = (200, 80, 40)
        nat = native.encode_jpeg(img, 95)
        if nat is None:
            pytest.skip("native encoder not built")
        a, b = _decode(nat).astype(int), _decode(
            encode_frame_jpeg(img, 95)).astype(int)
        assert np.abs(a - b).mean() < 3

    def test_rgba_accepted(self):
        img = np.full((16, 16, 4), 128, np.uint8)
        assert encode_frame_jpeg(img)[:2] == b"\xff\xd8"


class TestFrameHub:
    def test_latest_frame_semantics(self):
        hub = FrameHub()
        seq, data = hub.wait_next(0, timeout=0.01)
        assert data is None and seq == 0
        hub.publish(b"a")
        hub.publish(b"b")
        seq, data = hub.wait_next(0, timeout=0.01)
        assert data == b"b" and seq == 2  # slow client skips, never lags
        seq2, data2 = hub.wait_next(seq, timeout=0.01)
        assert data2 is None and seq2 == seq


class TestViewerServer:
    @pytest.fixture(scope="class")
    def viewer(self):
        ui = UiState(scene="triangle", enable_tone_mapping=True)
        session = Session(width=128, height=64, ui=ui, readback_depth=1)
        v = ViewerServer(session, port=0, max_fps=120).start()
        # Block until the first frame is published (first render carries
        # the jit compile).
        seq, data = v.hub.wait_next(0, timeout=300)
        assert data is not None, "no frame within 300s"
        yield v
        v.stop()

    def _get(self, viewer, path, timeout=60):
        return urllib.request.urlopen(
            f"http://127.0.0.1:{viewer.port}{path}", timeout=timeout)

    def test_page_and_frame(self, viewer):
        page = self._get(viewer, "/").read()
        assert b"/stream" in page and b"mousedown" in page
        frame = self._get(viewer, "/frame.jpg").read()
        img = _decode(frame)
        assert img.shape == (64, 128, 3)
        assert img.max() > 30  # the triangle is visible, not a black frame

    def test_stream_yields_multipart_frames(self, viewer):
        resp = self._get(viewer, "/stream")
        assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
        # Parse two multipart parts off the live stream.
        for _ in range(2):
            assert resp.readline().strip() == b"--bibimframe"
            headers = {}
            while True:
                line = resp.readline().strip()
                if not line:
                    break
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
            n = int(headers[b"content-length"])
            data = resp.read(n)
            assert data[:2] == b"\xff\xd8"
            assert resp.readline() == b"\r\n"
        resp.close()

    def test_events_drive_the_camera(self, viewer):
        """POST browser events → Session.handle_event → camera moves,
        exactly like the scripted-replay path (0.6°/px drag)."""
        cam = viewer.session.camera
        yaw0 = cam.yaw

        def post(evs):
            req = urllib.request.Request(
                f"http://127.0.0.1:{viewer.port}/event",
                data=json.dumps(evs).encode(), method="POST")
            assert urllib.request.urlopen(req, timeout=10).status == 200

        # Press + drag arrive in one frame's event drain; the release goes
        # in a later one (a press and release polled in the SAME frame is
        # no drag — per-frame event polling, like the reference's SDL
        # loop, main.cpp:1132-1147).
        post([{"mouse": True, "cursor": [0, 0]}, {"cursor": [40, 0]}])
        deadline = time.time() + 60
        while time.time() < deadline and cam.yaw == yaw0:
            time.sleep(0.05)
        post([{"mouse": False}])
        assert cam.yaw == pytest.approx(yaw0 - 40 * 0.6)
        # /ui reports the LIVE camera pose, not the save/load snapshot.
        ui = json.loads(self._get(viewer, "/ui").read())
        assert ui["camera_yaw"] == pytest.approx(cam.yaw)

    def test_stats_and_bad_event(self, viewer):
        stats = json.loads(self._get(viewer, "/stats").read())
        assert stats["size"] == [128, 64]
        req = urllib.request.Request(
            f"http://127.0.0.1:{viewer.port}/event",
            data=b"not json", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400

    def test_ui_and_materials_endpoints(self, viewer):
        """The reference GUI's full toggle surface is reachable over HTTP
        (VERDICT r3 #8): /ui reflects live UiState, /materials lists the
        PBR set, /preview/N.jpg serves the per-material map strip."""
        ui = json.loads(self._get(viewer, "/ui").read())
        assert ui["scene"] == "triangle"
        assert ui["deferred"] is True
        for key in ("enable_normal_map", "enable_tbn", "show_hud",
                    "num_instances", "selected_material", "aniso_taps"):
            assert key in ui, key
        mats = json.loads(self._get(viewer, "/materials").read())
        assert len(mats["names"]) >= 2  # default + at least one PBR set
        assert mats["selected"] == ui["selected_material"]
        prev = self._get(viewer, "/preview/0.jpg").read()
        img = _decode(prev)
        assert img.shape[0] == 128 and img.shape[1] % 128 == 0
        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(viewer, "/preview/999.jpg")
        assert e.value.code == 404

    def test_page_has_reference_gui_controls(self, viewer):
        page = self._get(viewer, "/").read().decode()
        for ctl in ("id=\"scene\"", "id=\"path\"", "id=\"nm\"",
                    "id=\"tbn\"", "id=\"inst\"", "id=\"mat\"",
                    "id=\"hud\"", "id=\"aniso\"", "/materials",
                    "/preview/"):
            assert ctl in page, ctl

    def test_stream_client_disconnect_no_wedge_or_leak(self, viewer):
        """Abrupt client disconnect mid-MJPEG-stream (tab closed, resize
        storm) must neither wedge the server nor leak handler threads
        (VERDICT r4 #8 — the reference survives window drag-resize
        storms; the analog here is stream churn)."""
        import threading

        conns = []
        for _ in range(5):
            resp = self._get(viewer, "/stream")
            assert resp.readline().strip() == b"--bibimframe"
            conns.append(resp)
        base = threading.active_count()  # includes the 5 live handlers
        for resp in conns:
            resp.close()  # abrupt: no clean multipart termination exists
        # The server keeps presenting to new clients...
        frame = self._get(viewer, "/frame.jpg").read()
        assert frame[:2] == b"\xff\xd8"
        # ...and the 5 handler threads unwind once their next frame write
        # hits the dead socket (wait_next timeout is 1 s; give slack).
        deadline = time.time() + 30
        while time.time() < deadline:
            if threading.active_count() <= base - 5:
                break
            time.sleep(0.1)
        assert threading.active_count() <= base - 5, (
            f"stream handler threads leaked: {threading.active_count()} "
            f"alive vs {base} with 5 streams open"
        )
        # Streams still work after the churn.
        resp = self._get(viewer, "/stream")
        assert resp.readline().strip() == b"--bibimframe"
        resp.close()

    def test_concurrent_set_flood_during_render(self, viewer):
        """Concurrent /event set floods from many clients while frames
        render: no errors, the render loop keeps advancing, and the
        final UI state is one of the posted values (VERDICT r4 #8)."""
        import threading

        def post(evs):
            req = urllib.request.Request(
                f"http://127.0.0.1:{viewer.port}/event",
                data=json.dumps(evs).encode(), method="POST")
            assert urllib.request.urlopen(req, timeout=30).status == 200

        errs = []

        def flood(i):
            try:
                for j in range(40):
                    post([{"set": {"exposure": 0.5 + (j % 8) * 0.25}},
                          {"cursor": [j % 64, i]}])
            except Exception as e:  # noqa: BLE001 - collected for assert
                errs.append(e)

        frames0 = viewer.frames
        threads = [threading.Thread(target=flood, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        assert not any(t.is_alive() for t in threads)
        # Render loop survived the flood and keeps presenting.
        deadline = time.time() + 60
        while time.time() < deadline and viewer.frames <= frames0:
            time.sleep(0.05)
        assert viewer.frames > frames0
        # The queue drained into UiState: exposure is one posted value.
        deadline = time.time() + 60
        ui = {}
        while time.time() < deadline:
            ui = json.loads(self._get(viewer, "/ui").read())
            if any(abs(ui["exposure"] - (0.5 + k * 0.25)) < 1e-6
                   for k in range(8)):
                break
            time.sleep(0.05)
        assert any(abs(ui["exposure"] - (0.5 + k * 0.25)) < 1e-6
                   for k in range(8)), ui["exposure"]
        post([{"set": {"exposure": 1.0}}])  # restore for other tests

    def test_event_queue_bounded_when_loop_stalled(self):
        """The pending-event queue is capped (_EVENT_QUEUE_CAP, the
        SDL-queue-full analog): flooding /event while the render loop is
        stalled drops oldest instead of growing without bound."""
        from bibim_tpu.host.serve import _EVENT_QUEUE_CAP

        ui = UiState(scene="triangle")
        session = Session(width=128, height=64, ui=ui, readback_depth=1)
        v = ViewerServer(session, port=0, max_fps=120)
        # Start ONLY the HTTP thread: the render loop never drains, which
        # is exactly the stalled-loop (first-compile) scenario.
        v._http_thread.start()
        try:
            batch = [{"cursor": [i % 64, 0]} for i in range(1000)]
            for _ in range(10):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{v.port}/event",
                    data=json.dumps(batch).encode(), method="POST")
                assert urllib.request.urlopen(req, timeout=30).status == 200
            with v._ev_lock:
                n = len(v._events)
            assert n <= _EVENT_QUEUE_CAP, n
            assert v.events_dropped == 10 * 1000 - _EVENT_QUEUE_CAP
        finally:
            v.httpd.shutdown()
            v.httpd.server_close()

    def test_gui_toggle_events_apply(self, viewer):
        """Every reference GUI toggle round-trips: POST /event set →
        UiState (the render loop drains it) → /ui reports it."""
        def post(evs):
            req = urllib.request.Request(
                f"http://127.0.0.1:{viewer.port}/event",
                data=json.dumps(evs).encode(), method="POST")
            assert urllib.request.urlopen(req, timeout=10).status == 200

        sets = {"enable_normal_map": True, "enable_tbn": True,
                "show_hud": True, "deferred": False,
                "selected_material": 0}
        post([{"set": sets}])
        deadline = time.time() + 60
        ui = {}
        while time.time() < deadline:
            ui = json.loads(self._get(viewer, "/ui").read())
            if ui.get("deferred") is False:
                break
            time.sleep(0.05)
        for k, v in sets.items():
            assert ui[k] == v, (k, ui[k])
        # Restore (other tests share the fixture).
        post([{"set": {"deferred": True, "enable_tbn": False,
                       "show_hud": False, "enable_normal_map": False}}])
