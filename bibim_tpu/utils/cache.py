"""Persistent compilation cache setup.

The TPU in this environment is attached through a stdio relay; uploading a
freshly compiled executable can take minutes. Caching compiled programs on
disk makes every process after the first start fast (the Vulkan
pipeline-cache analog).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    path = Path(cache_dir) if cache_dir else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax or read-only fs: cache is best-effort
        pass
