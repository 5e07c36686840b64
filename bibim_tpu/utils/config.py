"""Resource path / config system (reference src/resource.cpp:51-145).

The reference reads a ``config.toml`` next to the executable with
``[resource_path] common_root / shader_root`` and joins/normalizes Windows
paths. Here: read ``config.toml`` from the repo root (or an explicit path, or
``BIBIM_CONFIG`` env), with POSIX path handling via ``pathlib``. ``shader_root``
has no on-disk meaning on TPU (shaders are jit-compiled Python) but is kept
for config compatibility.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass
from pathlib import Path

_DEFAULT_COMMON_ROOT = "/root/reference/resources"


@dataclass(frozen=True)
class ResourceRoot:
    common_root: Path
    shader_root: Path

    def common(self, *relative: str) -> Path:
        """createCommonResourcePath analog (resource.h:10-17)."""
        return self.common_root.joinpath(*relative)

    def shader(self, *relative: str) -> Path:
        return self.shader_root.joinpath(*relative)


_active_root: ResourceRoot | None = None


def init_resource_root(config_path: str | os.PathLike | None = None) -> ResourceRoot:
    """Load the resource root config (initResourceRoot, resource.cpp:113-145).

    Search order: explicit arg → $BIBIM_CONFIG → config.toml beside this
    package's repo root → built-in default pointing at the reference assets.
    """
    global _active_root
    candidates = []
    if config_path is not None:
        candidates.append(Path(config_path))
    if "BIBIM_CONFIG" in os.environ:
        candidates.append(Path(os.environ["BIBIM_CONFIG"]))
    candidates.append(Path(__file__).resolve().parents[2] / "config.toml")

    common_root = Path(_DEFAULT_COMMON_ROOT)
    shader_root = common_root / "shaders"
    for cand in candidates:
        if cand.is_file():
            with open(cand, "rb") as f:
                data = tomllib.load(f)
            section = data.get("resource_path", {})
            base = cand.parent
            if "common_root" in section:
                common_root = (base / section["common_root"]).resolve()
            if "shader_root" in section:
                shader_root = (base / section["shader_root"]).resolve()
            break

    _active_root = ResourceRoot(common_root=common_root, shader_root=shader_root)
    return _active_root


def get_resource_root() -> ResourceRoot:
    """Active root, initializing defaults on first use."""
    global _active_root
    if _active_root is None:
        _active_root = init_resource_root()
    return _active_root
