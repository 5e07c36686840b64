"""On-disk asset cache.

The reference re-imports FBX/PNG assets every launch (~seconds on a fast
desktop). Here, decode + mip building on the single-core host costs tens of
seconds per process, so parsed meshes and material sets cache to ``.asset_cache/``
keyed by (path, mtime, size) — functionally the same startup, much faster.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path

from bibim_tpu.utils.log import log_info

_CACHE_DIR = Path(__file__).resolve().parents[2] / ".asset_cache"


def _key(tag: str, paths: list[Path]) -> str:
    h = hashlib.sha1(tag.encode())
    for p in sorted(paths):
        st = p.stat()
        h.update(str(p).encode())
        h.update(str(st.st_mtime_ns).encode())
        h.update(str(st.st_size).encode())
    return h.hexdigest()[:24]


def cached(tag: str, source_paths: list[os.PathLike], builder):
    """Return builder()'s result, cached on disk keyed by the source files."""
    paths = [Path(p) for p in source_paths if Path(p).exists()]
    try:
        key = _key(tag, paths)
    except OSError:
        return builder()
    cache_file = _CACHE_DIR / f"{tag}-{key}.pkl"
    if cache_file.is_file():
        try:
            with open(cache_file, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass
    result = builder()
    try:
        _CACHE_DIR.mkdir(parents=True, exist_ok=True)
        tmp = cache_file.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(result, f, protocol=pickle.HIGHEST_PROTOCOL)
        tmp.replace(cache_file)
        log_info("asset cache: stored {}", cache_file.name)
    except Exception:
        pass
    return result
