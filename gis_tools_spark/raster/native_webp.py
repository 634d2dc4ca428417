"""ctypes binding to the system libwebp (when present) — real lossy
VP8 WebP decode/encode at C rate, no pip wheel needed.

Reference parity: gis-tools reads imagery via PIL/GDAL drivers
(/root/reference/gistools/raster.py:99-141), which delegate WebP to
libwebp; binding the same public C API directly closes the lossy-VP8
gap the pure-python VP8L codec (raster/webp.py) cannot cover. Only
simple pointer-returning entry points are used (WebPGetInfo,
WebPDecodeRGBA, WebPEncodeRGB, WebPEncodeLosslessRGB, WebPFree) — no
struct ABI, no setjmp error contracts, so a corrupt buffer returns
NULL instead of unwinding C state under the worker.

Everything degrades gracefully: ``available()`` is False when the
shared library is absent and every caller falls back to the
pure-python VP8L path (or raises its honest NotImplementedError).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _lib = None
        return None
    try:
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float,
                                      ctypes.POINTER(ctypes.POINTER(
                                          ctypes.c_uint8))]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except AttributeError:
        _lib = None
        return None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode(buf: bytes) -> np.ndarray:
    """Any WebP (lossy VP8, lossless VP8L, extended VP8X) → (h,w,3)
    uint8 RGB. Raises ValueError on corrupt input, RuntimeError when
    libwebp is absent."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libwebp not available")
    buf = bytes(buf)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w),
                             ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp: decode failed (corrupt or truncated)")
    try:
        n = w.value * h.value * 4
        rgba = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(
            h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return rgba[:, :, :3]


def decode_yuv(buf: bytes):
    """WebP bytes → (y, u, v) uint8 planes straight from libwebp's
    decoder (WebPDecodeYUV — pointer-returning, same ABI policy as the
    other entry points). The plane-exact oracle for the from-scratch
    VP8 decoder's conformance tests (tests/test_vp8.py)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libwebp not available")
    try:
        fn = lib.WebPDecodeYUV
    except AttributeError:
        raise RuntimeError("libwebp lacks WebPDecodeYUV")
    fn.restype = ctypes.POINTER(ctypes.c_uint8)
    fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                   ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                   ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    buf = bytes(buf)
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = fn(buf, len(buf), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(up), ctypes.byref(vp), ctypes.byref(stride),
            ctypes.byref(uv_stride))
    if not yp:
        raise ValueError("libwebp: YUV decode failed")
    try:
        cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
        y = np.ctypeslib.as_array(yp, shape=(h.value, stride.value)) \
            [:, :w.value].copy()
        u = np.ctypeslib.as_array(up, shape=(ch, uv_stride.value)) \
            [:, :cw].copy()
        v = np.ctypeslib.as_array(vp, shape=(ch, uv_stride.value)) \
            [:, :cw].copy()
    finally:
        lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return y, u, v


def decode_rgb(buf: bytes) -> np.ndarray:
    """WebP bytes → (h,w,3) RGB via libwebp's WebPDecodeRGB (the exact
    fancy-upsampling output the pure decoder mirrors)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libwebp not available")
    try:
        fn = lib.WebPDecodeRGB
    except AttributeError:
        raise RuntimeError("libwebp lacks WebPDecodeRGB")
    fn.restype = ctypes.POINTER(ctypes.c_uint8)
    fn.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    buf = bytes(buf)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = fn(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp: decode failed")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out


def encode(arr: np.ndarray, quality: float = 85.0,
           lossless: bool = False) -> bytes:
    """(h,w) or (h,w,3) uint8 → WebP bytes (lossy VP8 by default)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libwebp not available")
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = np.ascontiguousarray(arr).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        size = lib.WebPEncodeLosslessRGB(flat, w, h, w * 3,
                                         ctypes.byref(out))
    else:
        size = lib.WebPEncodeRGB(flat, w, h, w * 3, float(quality),
                                 ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp: encode failed")
    try:
        data = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return data
