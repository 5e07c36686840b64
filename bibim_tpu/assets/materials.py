"""PBR material sets.

Parity target: ``createPBRMaterialSet`` (render.cpp:1243-1316) +
``getPBRMapOrDefault`` (render.cpp:1328-1336). A material is 6 maps —
Albedo, Metallic, Roughness, AO, Normal, Height (PBRMapType,
render.h:235-243) — discovered by scanning ``resources/pbr/<name>/<map>.png``.
All maps of all materials decode concurrently; the ``default`` material is
split out, and any missing map falls back per-map to the default material's.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from enum import IntEnum
from pathlib import Path

import numpy as np

from bibim_tpu.assets.image import build_mip_pyramid
from bibim_tpu.assets.loader import ImageLoader
from bibim_tpu.utils.config import get_resource_root
from bibim_tpu.utils.log import log_info


class PBRMapType(IntEnum):
    """render.h:235-243 — enum order defines map stacking order."""

    ALBEDO = 0
    METALLIC = 1
    ROUGHNESS = 2
    AO = 3
    NORMAL = 4
    HEIGHT = 5


_MAP_FILE_NAMES = {
    PBRMapType.ALBEDO: "albedo.png",
    PBRMapType.METALLIC: "metallic.png",
    PBRMapType.ROUGHNESS: "roughness.png",
    PBRMapType.AO: "ao.png",
    PBRMapType.NORMAL: "normal.png",
    PBRMapType.HEIGHT: "height.png",
}

# Neutral per-map constants used only if even the default material lacks a
# map: albedo white, metallic 0, roughness 1, ao 1, normal +Z, height 0.
_NEUTRAL_TEXELS = {
    PBRMapType.ALBEDO: (255, 255, 255, 255),
    PBRMapType.METALLIC: (0, 0, 0, 255),
    PBRMapType.ROUGHNESS: (255, 255, 255, 255),
    PBRMapType.AO: (255, 255, 255, 255),
    PBRMapType.NORMAL: (128, 128, 255, 255),
    PBRMapType.HEIGHT: (0, 0, 0, 255),
}


@dataclass
class PBRMaterial:
    """One material: name + per-map mip pyramids ((H,W,4) uint8 level 0)."""

    name: str
    maps: dict[PBRMapType, list[np.ndarray] | None] = field(default_factory=dict)

    def map_or_none(self, map_type: PBRMapType) -> list[np.ndarray] | None:
        return self.maps.get(map_type)


@dataclass
class PBRMaterialSet:
    materials: list[PBRMaterial]
    default_material: PBRMaterial

    def get_pbr_map_or_default(
        self, material_index: int, map_type: PBRMapType
    ) -> list[np.ndarray]:
        """Per-map fallback to the default material (render.cpp:1328-1336)."""
        mips = self.materials[material_index].map_or_none(map_type)
        if mips is None:
            mips = self.default_material.map_or_none(map_type)
        if mips is None:
            texel = np.asarray(_NEUTRAL_TEXELS[map_type], np.uint8).reshape(1, 1, 4)
            mips = [texel]
        return mips

    @property
    def names(self) -> list[str]:
        return [m.name for m in self.materials]


def create_pbr_material_set(
    pbr_root: str | os.PathLike | None = None, with_mips: bool = True
) -> PBRMaterialSet:
    """Scan ``<common_root>/pbr/*`` directories and load all maps concurrently
    (render.cpp:1249-1300). Directories with no recognized maps are kept (the
    reference keeps e.g. 'empty' as an all-default material). Disk-cached."""
    from bibim_tpu.assets.asset_cache import cached

    root = Path(pbr_root) if pbr_root is not None else get_resource_root().common("pbr")
    sources = sorted(root.glob("*/*.png")) if root.is_dir() else []
    return cached(
        f"pbrset{'m' if with_mips else ''}",
        sources,
        lambda: _create_pbr_material_set_uncached(root, with_mips),
    )


def _create_pbr_material_set_uncached(
    root: Path, with_mips: bool = True
) -> PBRMaterialSet:
    loader = ImageLoader()
    materials: list[PBRMaterial] = []
    sinks: list[tuple[PBRMaterial, PBRMapType]] = []

    for entry in sorted(root.iterdir()) if root.is_dir() else []:
        if not entry.is_dir():
            continue
        mat = PBRMaterial(name=entry.name, maps={t: None for t in PBRMapType})
        materials.append(mat)
        for map_type, fname in _MAP_FILE_NAMES.items():
            fpath = entry / fname
            if fpath.is_file():

                def sink(img, _mat=mat, _t=map_type):
                    if img is not None:
                        _mat.maps[_t] = (
                            build_mip_pyramid(img) if with_mips else [img]
                        )

                loader.enqueue_image_load_task(fpath, sink)
                sinks.append((mat, map_type))

    loader.finalize_all_image_loads()

    # Split out the 'default' material (render.cpp:1304-1313).
    default = next((m for m in materials if m.name == "default"), None)
    if default is not None:
        materials = [m for m in materials if m is not default]
    else:
        default = PBRMaterial(name="default", maps={t: None for t in PBRMapType})

    log_info(
        "PBR material set: {} materials + default ({} maps loaded)",
        len(materials),
        sum(1 for m in [default, *materials] for v in m.maps.values() if v),
    )
    return PBRMaterialSet(materials=materials, default_material=default)
