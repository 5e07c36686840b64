"""ctypes binding for the native C++ data-loading runtime (native/).

The reference decodes images in native code on worker threads
(resource.cpp:157-267); ``native/bibim_native.cpp`` is the equivalent here.
Import is optional — callers fall back to PIL when the shared library hasn't
been built (see assets/loader.py).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[1] / "native" / "libbibim_native.so",
]


class _DecodedImage(ctypes.Structure):
    _fields_ = [
        ("pixels", ctypes.POINTER(ctypes.c_uint8)),
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
    ]


def _load_lib():
    for p in _LIB_PATHS:
        if p.is_file():
            lib = ctypes.CDLL(str(p))
            lib.bibim_decode_image.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(_DecodedImage),
            ]
            lib.bibim_decode_image.restype = ctypes.c_int
            lib.bibim_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(_DecodedImage),
                ctypes.c_int,
            ]
            lib.bibim_decode_batch.restype = ctypes.c_int
            lib.bibim_free_image.argtypes = [ctypes.POINTER(_DecodedImage)]
            lib.bibim_native_version.restype = ctypes.c_char_p
            if hasattr(lib, "bibim_write_png"):
                lib.bibim_write_png.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.bibim_write_png.restype = ctypes.c_int
            if hasattr(lib, "bibim_encode_jpeg"):
                lib.bibim_encode_jpeg.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ]
                lib.bibim_encode_jpeg.restype = ctypes.c_int
                lib.bibim_free_buffer.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8)
                ]
            return lib
    raise ImportError("libbibim_native.so not built (run `make -C native`)")


_lib = _load_lib()


def native_version() -> str:
    return _lib.bibim_native_version().decode()


def _to_array(img: _DecodedImage) -> np.ndarray:
    n = img.width * img.height * 4
    buf = np.ctypeslib.as_array(img.pixels, shape=(n,))
    out = buf.reshape(img.height, img.width, 4).copy()
    _lib.bibim_free_image(ctypes.byref(img))
    return out


def decode_image_rgba8(path: str) -> np.ndarray | None:
    """Decode one PNG/JPEG to (H, W, 4) uint8, or None on failure."""
    img = _DecodedImage()
    if not _lib.bibim_decode_image(path.encode(), ctypes.byref(img)):
        return None
    return _to_array(img)


def decode_batch_rgba8(paths: list[str], max_threads: int = 64) -> list[np.ndarray | None]:
    """Decode many files concurrently on native threads."""
    n = len(paths)
    if n == 0:
        return []
    arr = (_DecodedImage * n)()
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    _lib.bibim_decode_batch(c_paths, n, arr, max_threads)
    return [(_to_array(arr[i]) if arr[i].pixels else None) for i in range(n)]


def write_png(path: str, image: np.ndarray, compress_level: int = 1) -> bool:
    """Encode an (H, W, 3|4) uint8 array as PNG via the native writer
    (the swapchain-present analog; libpng at a low compression level is
    several times faster than the Python encoder at 1080p). Returns False
    if the library lacks the writer (rebuild native/) or on IO failure."""
    if not hasattr(_lib, "bibim_write_png"):
        return False
    arr = np.ascontiguousarray(image)
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"need (H, W, 3|4) uint8, got {arr.shape} {arr.dtype}")
    h, w, c = arr.shape
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return bool(_lib.bibim_write_png(path.encode(), ptr, w, h, c,
                                     compress_level))


def encode_jpeg(image: np.ndarray, quality: int = 85) -> bytes | None:
    """Encode an (H, W, 3|4) uint8 array to in-memory JPEG bytes via the
    native encoder (the live-viewer present path — host/serve.py streams
    these as MJPEG). Returns None if the library lacks the encoder
    (rebuild native/) or on encode failure."""
    if not hasattr(_lib, "bibim_encode_jpeg"):
        return None
    arr = np.ascontiguousarray(image)
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"need (H, W, 3|4) uint8, got {arr.shape} {arr.dtype}")
    h, w, c = arr.shape
    ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.bibim_encode_jpeg(ptr, w, h, c, quality, ctypes.byref(out))
    if n <= 0:
        return None
    data = ctypes.string_at(out, n)
    _lib.bibim_free_buffer(out)
    return data
