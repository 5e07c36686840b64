"""Interactive render session — the live frame loop of main.cpp:1131-1381.

The reference's loop is: SDL events → Input → ImGui state → camera update →
scene update → record + submit → present. This session reproduces that
control flow headlessly:

- an *event source* (scripted replay, tests, or an embedding UI) feeds
  key/mouse/state events per frame,
- :class:`Input` accumulates them (src/input.h analog),
- the free-look camera consumes drag (0.6°/px, pitch clamp ±88°) and WASD
  (4 u/s) exactly like main.cpp:1237-1262,
- scenes are constructed lazily on first selection and kept alive for
  switching without restart (main.cpp:1173-1182),
- material selection rebinds descriptor-set-analog quad tables
  (scene.cpp:141-151),
- frames are dispatched with 2-deep readback (numFrames=2, main.cpp:38).

Event script format (JSON list; replay with ``Session.run_script``):
    [{"frame": 0, "key": "w", "down": true},
     {"frame": 2, "cursor": [40, 10], "mouse": true},
     {"frame": 5, "set": {"scene": "gizmo", "exposure": 2.0}}]
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from bibim_tpu import math3d as m3
from bibim_tpu.host.gui import UiState
from bibim_tpu.host.readback import DoubleBufferedReadback
from bibim_tpu.pipeline import (
    FrameParams,
    GBufferViz,
    RenderSettings,
    ViewBlock,
    make_overlay_resources,
    material_quads_from_set,
    render_frame,
)
from bibim_tpu.scene import FreeLookCamera, Input
from bibim_tpu.utils.log import log_info
from bibim_tpu.utils.profiling import FrameStats

VIZ_BY_NAME = {
    "position": GBufferViz.POSITION,
    "normal": GBufferViz.NORMAL,
    "albedo": GBufferViz.ALBEDO,
    "mrha": GBufferViz.MRHA,
    "matindex": GBufferViz.MATERIAL_INDEX,
    "scene": GBufferViz.RENDERED_SCENE,
}


def _make_scene(name: str, ui: UiState):
    if name == "triangle":
        from bibim_tpu.scene.triangle import TriangleScene

        return TriangleScene()
    if name == "shaderball":
        from bibim_tpu.scene.shaderball import ShaderBallScene

        return ShaderBallScene(num_instances=max(1, ui.num_instances))
    if name == "gizmo":
        from bibim_tpu.scene.gizmoscene import GizmoScene

        return GizmoScene()
    if name == "cube":
        from bibim_tpu.scene.cube import CubeScene

        return CubeScene()
    if name == "mesh":
        from bibim_tpu.scene.meshscene import MeshScene

        if not ui.mesh_path:
            raise ValueError("scene 'mesh' needs UiState.mesh_path")
        return MeshScene(path=ui.mesh_path)
    raise ValueError(f"unknown scene {name!r}")


@dataclass
class Session:
    """Owns the mutable host state of one interactive run."""

    width: int = 1280
    height: int = 720
    ui: UiState = field(default_factory=UiState)
    readback_depth: int = 2

    def __post_init__(self):
        from bibim_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.input = Input()
        self.camera = FreeLookCamera(
            pos=np.asarray(self.ui.camera_pos, np.float32),
            yaw=self.ui.camera_yaw,
            pitch=self.ui.camera_pitch,
        )
        self._scenes: dict = {}  # lazy construction (main.cpp:1173-1182)
        self._material_set = None
        self._materials: dict = {}  # material index → quad tables
        self._overlay = None
        self.readback = DoubleBufferedReadback(depth=self.readback_depth)
        self.stats = FrameStats()
        self._last_cursor_down = False
        # Adaptive capacities (pipeline.autotune): derived caps per scene
        # binding, re-probed (monotonically raised) when a completed
        # frame's diagnostics report drops.
        self._tuned: dict = {}
        self._pending_diags: list = []

    # -- resource binding ---------------------------------------------------

    @property
    def scene(self):
        name = self.ui.scene
        # Instance count is part of the scene identity (the viewer's
        # instance selector rebuilds the ShaderBall scene, matching the
        # reference's per-scene GUI, scene.cpp:128-139).
        key = (name,
               self.ui.num_instances if name == "shaderball" else 0)
        if key not in self._scenes:
            self._scenes[key] = _make_scene(name, self.ui)
        return self._scenes[key]

    def material_set(self):
        if self._material_set is None:
            from bibim_tpu.assets.materials import create_pbr_material_set

            self._material_set = create_pbr_material_set()
        return self._material_set

    def materials(self):
        if self.ui.scene == "cube":
            from bibim_tpu.scene.cube import cube_scene_materials

            key = "cube"
            if key not in self._materials:
                self._materials[key] = cube_scene_materials()
            return self._materials[key]
        idx = self.ui.selected_material
        if idx not in self._materials:
            self._materials[idx] = material_quads_from_set(
                self.material_set(), idx
            )
        return self._materials[idx]

    def overlay(self):
        if self._overlay is None:
            self._overlay = make_overlay_resources()
        return self._overlay

    # -- event handling (SDL_PollEvent analog, main.cpp:1132-1147) ----------

    def handle_event(self, ev: dict) -> None:
        if "key" in ev:
            self.input.process_key_event(ev["key"], bool(ev.get("down", True)))
        if "mouse" in ev:
            self.input.mouse_down = bool(ev["mouse"])
        if "cursor" in ev:
            x, y = ev["cursor"]
            self.input.update_cursor(int(x), int(y))
        if "set" in ev:
            fields = dict(ev["set"])
            if "size" in fields:
                w, h = fields.pop("size")
                self.resize(int(w), int(h))
            for k, v in fields.items():
                if not hasattr(self.ui, k):
                    raise ValueError(f"unknown ui field {k!r}")
                setattr(self.ui, k, v)
            self.ui.clamp()

    def resize(self, width: int, height: int) -> None:
        """Live resize mid-loop — the swapchain-recreation analog
        (onWindowResize, main.cpp:1042-1070): RenderSettings is the jit
        key, so the next frame recompiles at the new extent (the pipeline
        rebuild); size-derived host state (HUD geometry, probed caps) is
        invalidated. Frames already in flight at the old size drain
        through the readback unchanged."""
        if (width, height) == (self.width, self.height):
            return
        self.width, self.height = width, height
        self._hud_geom = None
        # Probed capacities are resolution-specific; _tune_key includes
        # the size, so stale entries are unreachable — drop them anyway.
        self._tuned.clear()
        log_info("resized to {}x{} (reloadable resources rebuild on next "
                 "frame)", width, height)

    def _update_camera(self, dt: float) -> None:
        """main.cpp:1237-1262: drag rotates, WASD moves."""
        if self.input.mouse_down:
            dx, dy = self.input.cursor_delta
            self.camera.apply_mouse_drag(dx, dy)
        self.input.cursor_delta = (0, 0)
        strafe, forward = self.input.movement_direction()
        if strafe or forward:
            self.camera.apply_movement(strafe, forward, dt)

    # -- frame --------------------------------------------------------------

    def _base_settings(self) -> RenderSettings:
        return RenderSettings(
            width=self.width,
            height=self.height,
            deferred=self.ui.deferred,
            shading="flat" if self.ui.scene == "gizmo" else "pbr",
            gbuffer_viz=VIZ_BY_NAME[self.ui.gbuffer_viz],
            show_tbn=self.ui.enable_tbn,
            show_hud=self.ui.show_hud,
            aniso_taps=self.ui.aniso_taps,
            batch_material_ids=getattr(self.scene, "material_ids", None),
            # Production compacted shading + the capacity scalars for the
            # drop watcher (they ride the existing readback sync).
            outputs="image+diag",
        )

    def _tune_key(self):
        return (self.ui.scene, self.ui.num_instances, self.width,
                self.height)

    def settings(self) -> RenderSettings:
        """The live loop runs with autotuned capacities (the bench-speed
        machinery: pass-0 grid compaction + coverage-compacted shading),
        derived from a one-off probe of the bound scene (VERDICT r1 items
        4/6: interactive frames must not run untuned)."""
        import dataclasses

        base = self._base_settings()
        tuned = self._tuned.get(self._tune_key())
        if tuned is not None:
            base = dataclasses.replace(base, **tuned)
        return base

    def _retune(self, scene_data, view_block) -> None:
        """(Re-)derive adaptive caps for the current scene + camera; caps
        only ever grow (elementwise max with the previous derivation) so
        a camera oscillating across a bucket edge cannot thrash."""
        from bibim_tpu.pipeline.autotune import autotune_settings

        derived, probe = autotune_settings(
            scene_data, view_block, self._base_settings(),
            overlay=self.overlay(),
        )
        caps = {
            "max_candidates": derived.max_candidates,
            "raster_passes": derived.raster_passes,
            "overflow_cap": derived.overflow_cap,
            "pair_budget": derived.pair_budget,
            "live_tile_cap": derived.live_tile_cap,
            "raster_tile_cap": derived.raster_tile_cap,
            "overlay_candidates": derived.overlay_candidates,
            "overlay_max_tiles": derived.overlay_max_tiles,
            "overlay_overflow_cap": derived.overlay_overflow_cap,
            # span_cap/span_mid_cap are routing choices whose overflow is
            # separately validated (overflow list / dropped_pairs) —
            # always take the fresh derivation.
            "span_cap": derived.span_cap,
            "span_mid_cap": derived.span_mid_cap,
        }
        old = self._tuned.get(self._tune_key())
        if old is not None:
            for k, v in caps.items():
                if k in ("span_cap", "span_mid_cap"):
                    continue
                if old[k] is None or v is None:
                    caps[k] = None  # None = uncapped; never shrink to a cap
                else:
                    caps[k] = max(old[k], v)
        self._tuned[self._tune_key()] = caps
        log_info("autotuned caps for {}: {} (probe: {} covered tiles, "
                 "{} pairs, worst tile {})", self.ui.scene, caps,
                 probe.covered_tiles, probe.total_pairs,
                 probe.max_candidates)

    def _hud(self):
        """Per-frame HUD payload: cached static cell geometry + the lit
        mask for this frame's stats line (FPS + camera pose — the debug
        text the reference shows in its ImGui windows)."""
        if not self.ui.show_hud:
            return None
        from bibim_tpu.host.hud import build_hud_geometry, hud_text_mask

        if getattr(self, "_hud_geom", None) is None:
            self._hud_geom = build_hud_geometry(self.width, self.height)
        p = self.camera.pos
        text = (f"{self.stats.fps:5.1f} FPS  POS {p[0]:.1f} {p[1]:.1f} "
                f"{p[2]:.1f}  YAW {self.camera.yaw:.0f} "
                f"PITCH {self.camera.pitch:.0f}")
        if self.ui.selected_instance >= 0:
            # Shader Balls window's instance tracker (scene.cpp:131-139).
            text += f"  INST {self.ui.selected_instance}"
        mask = hud_text_mask(text, self._hud_geom.max_chars)
        return (self._hud_geom, jnp.asarray(mask))

    def render(self, dt: float = 1 / 60):
        """One loop iteration: camera ← input, scene update, dispatch.

        Returns the host image of the frame readied this iteration (one
        frame behind the dispatch, or None while the pipeline fills)."""
        self._update_camera(dt)
        scene = self.scene
        scene.update_scene(dt)

        view_block = ViewBlock(
            view=jnp.asarray(self.camera.get_view_matrix()),
            proj=m3.perspective(60.0, self.width / self.height, 0.1, 1000.0),
            view_pos=jnp.asarray(self.camera.pos),
            enable_normal_map=jnp.int32(1 if self.ui.enable_normal_map else 0),
        )
        frame_params = FrameParams(
            enable_tone_mapping=jnp.int32(
                1 if self.ui.enable_tone_mapping else 0
            ),
            exposure=jnp.float32(self.ui.exposure),
        )
        data = scene.scene_data()
        if self._tune_key() not in self._tuned:
            self._retune(data, view_block)
        out = render_frame(
            data, view_block, frame_params, self.materials(),
            self.overlay(), self.settings(), hud=self._hud(),
        )
        self.stats.tick()
        img = self.readback.submit(out["image"])
        self._pending_diags.append((out.get("bin_diag"), data, view_block))
        if img is not None:
            diag, d_data, d_view = self._pending_diags.pop(0)
            if diag is not None and any(
                int(np.asarray(leaf)) > 0
                for leaf in (diag.dropped_overflow, diag.dropped_cap,
                             diag.dropped_pairs, diag.dropped_tiles)
            ):
                # A completed frame overflowed a derived cap: raise the
                # buckets from a fresh probe at that camera. The frame
                # itself is the one-frame glitch the margin didn't cover;
                # subsequent frames render complete again.
                log_info("frame reported dropped geometry — re-probing "
                         "capacities")
                self._retune(d_data, d_view)
        return img

    def run_script(self, events, n_frames: int, dt: float = 1 / 60):
        """Replay a recorded event stream over ``n_frames`` frames and
        yield every completed host frame (the scripted-session analog of
        the reference's live loop)."""
        if isinstance(events, (str, Path)):
            events = json.loads(Path(events).read_text())
        by_frame: dict[int, list] = {}
        for ev in events:
            by_frame.setdefault(int(ev.get("frame", 0)), []).append(ev)
        for f in range(n_frames):
            for ev in by_frame.get(f, []):
                self.handle_event(ev)
            img = self.render(dt)
            if img is not None:
                yield img
        for img in self.readback.flush():
            yield img


def save_material_previews(material_set, out_path: str,
                           tile: int = 128) -> str:
    """Material-map contact sheet — the ImGui material preview analog
    (scene.cpp:128-170): one row per material, one column per PBR map."""
    from PIL import Image

    from bibim_tpu.assets.materials import PBRMapType

    names = list(material_set.names)
    cols = list(PBRMapType)
    sheet = np.zeros((len(names) * tile, len(cols) * tile, 3), np.uint8)
    for mi in range(len(names)):
        for ci, t in enumerate(cols):
            img = np.asarray(material_set.get_pbr_map_or_default(mi, t)[0])
            im = Image.fromarray(img[:, :, :3]).resize(
                (tile, tile), Image.BILINEAR
            )
            sheet[mi * tile : (mi + 1) * tile,
                  ci * tile : (ci + 1) * tile] = np.asarray(im)
    Image.fromarray(sheet).save(out_path)
    log_info("material previews ({} × {}) → {}",
             len(names), [t.name.lower() for t in cols], out_path)
    return out_path
