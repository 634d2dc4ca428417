"""ctypes binding to the system libheif (when present) — real HEIC
(HEVC/H.265 in HEIF) and AVIF (AV1) still-image decode/encode at C
rate, no pip wheel needed.

Reference parity: gis-tools reads imagery via PIL/GDAL drivers
(/root/reference/gistools/raster.py:99-141), which delegate modern
container formats to the platform codec libraries; binding the same
public C API directly covers the two formats a 2020s web crawl
increasingly carries (iPhone HEIC, AVIF `<img>` payloads) that no
pure-python path can reach. Same design rules as
raster/native_webp.py:

- only the stable public API (`heif_context_*`, `heif_image_*`,
  `heif_encoder_*`); the lone struct crossing the ABI is
  ``heif_error`` — a POD ``{int code, int subcode, const char*}``
  documented stable since libheif 1.0;
- no setjmp / fatal-error contracts: every call returns an error
  struct, so a corrupt buffer produces a ValueError, never C-state
  unwinding under the Spark worker;
- encode writes through ``heif_context_write_to_file`` on an
  anonymous ``memfd`` (``/proc/self/fd/N``) because ctypes callbacks
  cannot return structs (``heif_writer.write`` returns ``heif_error``
  by value); nothing touches the filesystem.

Everything degrades gracefully: ``available()`` is False when the
shared library (or the needed codec plugin) is absent and callers
raise their honest NotImplementedError instead.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np

# enum heif_compression_format
HEVC = 1
AV1 = 4
# enum heif_colorspace / heif_chroma / heif_channel
_CS_RGB = 1
_CHROMA_ILV_RGB = 10
_CH_INTERLEAVED = 10

_lib = None
_tried = False


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    name = ctypes.util.find_library("heif") or "libheif.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _lib = None
        return None
    E = _HeifError
    try:
        lib.heif_context_alloc.restype = ctypes.c_void_p
        lib.heif_context_free.restype = None
        lib.heif_context_free.argtypes = [ctypes.c_void_p]
        lib.heif_context_read_from_memory_without_copy.restype = E
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p]
        lib.heif_context_get_primary_image_handle.restype = E
        lib.heif_context_get_primary_image_handle.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
        lib.heif_image_handle_get_width.restype = ctypes.c_int
        lib.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
        lib.heif_image_handle_get_height.restype = ctypes.c_int
        lib.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
        lib.heif_image_handle_release.restype = None
        lib.heif_image_handle_release.argtypes = [ctypes.c_void_p]
        lib.heif_decode_image.restype = E
        lib.heif_decode_image.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
        lib.heif_image_get_plane_readonly.restype = \
            ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane_readonly.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.heif_image_release.restype = None
        lib.heif_image_release.argtypes = [ctypes.c_void_p]
        lib.heif_image_create.restype = E
        lib.heif_image_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.heif_image_add_plane.restype = E
        lib.heif_image_add_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.heif_context_get_encoder_for_format.restype = E
        lib.heif_context_get_encoder_for_format.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
        lib.heif_encoder_set_lossy_quality.restype = E
        lib.heif_encoder_set_lossy_quality.argtypes = [
            ctypes.c_void_p, ctypes.c_int]
        lib.heif_encoder_set_parameter_string.restype = E
        lib.heif_encoder_set_parameter_string.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
        lib.heif_encoder_set_parameter_integer.restype = E
        lib.heif_encoder_set_parameter_integer.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.heif_encoder_release.restype = None
        lib.heif_encoder_release.argtypes = [ctypes.c_void_p]
        lib.heif_context_encode_image.restype = E
        lib.heif_context_encode_image.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
        lib.heif_context_write_to_file.restype = E
        lib.heif_context_write_to_file.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p]
        lib.heif_have_decoder_for_format.restype = ctypes.c_int
        lib.heif_have_decoder_for_format.argtypes = [ctypes.c_int]
        lib.heif_have_encoder_for_format.restype = ctypes.c_int
        lib.heif_have_encoder_for_format.argtypes = [ctypes.c_int]
    except AttributeError:
        _lib = None
        return None
    _lib = lib
    return lib


def available(comp: int = HEVC, *, encode: bool = False) -> bool:
    """True when libheif is loadable AND carries the codec plugin."""
    lib = _load()
    if lib is None:
        return False
    fn = (lib.heif_have_encoder_for_format if encode
          else lib.heif_have_decoder_for_format)
    return bool(fn(comp))


def probe(buf: bytes) -> str | None:
    """Sniff an ISO-BMFF still image: 'heic' | 'avif' | None.

    Brand check only (ftyp major/compatible brands) — cheap enough to
    run per-row in format dispatch without touching libheif."""
    b = bytes(buf[:64])
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    brands = {bytes(b[i:i + 4]) for i in range(8, min(len(b), 32), 4)}
    if brands & {b"avif", b"avis"}:
        return "avif"
    if brands & {b"heic", b"heix", b"hevc", b"mif1", b"msf1"}:
        return "heic"
    return None


def decode(buf: bytes) -> np.ndarray:
    """HEIC/AVIF → (h, w, 3) uint8 RGB (primary image).

    Raises ValueError on corrupt/unsupported input, RuntimeError when
    libheif is absent."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libheif not available")
    data = bytes(buf)
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise RuntimeError("heif_context_alloc failed")
    # NOTE: decode-side thread pinning was tried and reverted —
    # heif_context_set_max_decoding_threads resolves in this libheif
    # build but segfaults when called; measured decode contention is
    # mild (avif 5.8→6.8-8.3 ms at 16-way) so the knob isn't worth a
    # version-sniffing dance.
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        keep = ctypes.create_string_buffer(data, len(data))
        err = lib.heif_context_read_from_memory_without_copy(
            ctx, keep, len(data), None)
        if err.code:
            raise ValueError(f"heif read: {err.message!r}")
        err = lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle))
        if err.code:
            raise ValueError(f"heif primary image: {err.message!r}")
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if w <= 0 or h <= 0 or w * h > 1 << 28:
            raise ValueError(f"heif: implausible dims {w}x{h}")
        err = lib.heif_decode_image(handle, ctypes.byref(img),
                                    _CS_RGB, _CHROMA_ILV_RGB, None)
        if err.code:
            raise ValueError(f"heif decode: {err.message!r}")
        stride = ctypes.c_int()
        p = lib.heif_image_get_plane_readonly(img, _CH_INTERLEAVED,
                                              ctypes.byref(stride))
        if not p:
            raise ValueError("heif: no interleaved plane")
        flat = np.ctypeslib.as_array(p, shape=(h * stride.value,))
        return (flat.reshape(h, stride.value)[:, :w * 3]
                .reshape(h, w, 3).copy())
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode(arr: np.ndarray, quality: int = 95, codec: str = "heic",
           chroma444: bool = True) -> bytes:
    """(h, w[, 3]) uint8 → HEIC (HEVC) or AVIF (AV1) bytes.

    Default quality 95 + 4:4:4 chroma keeps photo-content roundtrips
    comfortably above the north rule's PSNR≥40 dB lossy floor (the
    codecs' RGB→limited-range-YCbCr conversion makes a bit-exact
    lossless mode unreachable through this API — HEIC/AVIF rows are
    therefore always on the lossy verify path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libheif not available")
    comp = AV1 if codec == "avif" else HEVC
    a = np.asarray(arr)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("heif encode expects (h,w[,3]) uint8")
    h, w = a.shape[:2]
    ctx = lib.heif_context_alloc()
    img = ctypes.c_void_p()
    enc = ctypes.c_void_p()
    handle = ctypes.c_void_p()
    try:
        err = lib.heif_image_create(w, h, _CS_RGB, _CHROMA_ILV_RGB,
                                    ctypes.byref(img))
        if err.code:
            raise ValueError(f"heif image_create: {err.message!r}")
        err = lib.heif_image_add_plane(img, _CH_INTERLEAVED, w, h, 8)
        if err.code:
            raise ValueError(f"heif add_plane: {err.message!r}")
        stride = ctypes.c_int()
        p = lib.heif_image_get_plane(img, _CH_INTERLEAVED,
                                     ctypes.byref(stride))
        dst = np.ctypeslib.as_array(p, shape=(h * stride.value,)) \
            .reshape(h, stride.value)
        dst[:, :w * 3] = a.reshape(h, -1)
        err = lib.heif_context_get_encoder_for_format(
            ctx, comp, ctypes.byref(enc))
        if err.code:
            raise RuntimeError(f"heif encoder ({codec}): {err.message!r}")
        lib.heif_encoder_set_lossy_quality(enc, int(quality))
        if chroma444:
            # best-effort: both shipped plugins (x265, aom) accept it
            lib.heif_encoder_set_parameter_string(enc, b"chroma", b"444")
        if comp == HEVC:
            # x265's default preset spends ~77 ms/64×64 tile on encoder
            # init+RDO; veryfast measures 48 ms at PSNR 51 dB (>45 floor)
            lib.heif_encoder_set_parameter_string(enc, b"preset",
                                                  b"veryfast")
            # x265 spins a pool sized to ALL logical cores per encode
            # call; under 32 concurrent Spark workers that is 1000+
            # threads created/joined per Arrow batch. Tile encodes are
            # single-frame and tiny — run them on the calling thread
            # (pools=none implies frame-threads=1, wpp off).
            lib.heif_encoder_set_parameter_string(enc, b"x265:pools",
                                                  b"none")
            lib.heif_encoder_set_parameter_string(
                enc, b"x265:frame-threads", b"1")
        elif comp == AV1:
            # same disease, aom flavor: its worker pool defaults to the
            # core count per encode call. threads=1 measures 13.7→5.1
            # ms/img at IDENTICAL psnr (47.3 dB); speed presets are left
            # alone — they change the bitstream.
            lib.heif_encoder_set_parameter_integer(enc, b"threads", 1)
        err = lib.heif_context_encode_image(ctx, img, enc, None,
                                            ctypes.byref(handle))
        if err.code:
            raise ValueError(f"heif encode: {err.message!r}")
        fd = os.memfd_create("heif-out")
        try:
            err = lib.heif_context_write_to_file(
                ctx, f"/proc/self/fd/{fd}".encode())
            if err.code:
                raise ValueError(f"heif write: {err.message!r}")
            size = os.lseek(fd, 0, os.SEEK_END)
            os.lseek(fd, 0, os.SEEK_SET)
            return os.read(fd, size)
        finally:
            os.close(fd)
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        if enc:
            lib.heif_encoder_release(enc)
        if img:
            lib.heif_image_release(img)
        lib.heif_context_free(ctx)
