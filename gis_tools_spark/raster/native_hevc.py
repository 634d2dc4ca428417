"""Real compressed HEVC (H.265) video frames through system codec
libraries — encode via libheif/x265 (per-frame IDR stills), decode via
libde265 — no pip wheel, public C APIs only.

Reference parity: gis-tools has no video ops; this serves the brief's
multimodal-pipeline scope (frame sampling over a 100 TB crawl). The
engine's video model is a sequence of grayscale frames; an ``hvc1``
mp4 track here carries one independently-decodable IDR slice per
frame (the "all-intra" profile every frame-sampling pipeline prefers:
sampling frame k never decodes frames it does not keep).

Design notes:

- Encoding reuses raster/native_heif.py (libheif → x265): each frame
  becomes a HEIC still, and the HEVC NAL units are lifted back out of
  the ISO-BMFF container (hvcC parameter sets + iloc/mdat extents) —
  libx265's own C API is a function-pointer-table ABI (x265_api_get)
  that is not safely reachable from ctypes, while libheif's is.
- Decoding binds libde265's stable push-data API. Every call returns
  an error code (no setjmp / fatal-error unwinding under the Spark
  worker); corrupt payloads raise ValueError, never kill the task.
- Frames are full-range 4:4:4 (chroma444 in native_heif.encode), so a
  grayscale source round-trips through the Y plane without a
  limited-range squeeze: gray g → RGB (g,g,g) → Y ≈ g (measured ~50 dB
  on photo-like content at the default quality).

``available()`` degrades gracefully when either shared library is
missing; callers raise their honest NotImplementedError instead.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np

from . import native_heif
from .mp4 import Mp4Error, _boxes

_lib = None
_tried = False

# de265 error codes that mean "feed me more input", not failure
_DE265_OK = 0


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    name = ctypes.util.find_library("de265") or "libde265.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _lib = None
        return None
    try:
        lib.de265_new_decoder.restype = ctypes.c_void_p
        lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
        lib.de265_push_data.restype = ctypes.c_int
        lib.de265_push_data.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_void_p]
        lib.de265_flush_data.argtypes = [ctypes.c_void_p]
        lib.de265_decode.restype = ctypes.c_int
        lib.de265_decode.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_next_picture.restype = ctypes.c_void_p
        lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
        lib.de265_get_image_width.restype = ctypes.c_int
        lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_height.restype = ctypes.c_int
        lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_plane.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.de265_release_next_picture.argtypes = [ctypes.c_void_p]
    except AttributeError:
        _lib = None
        return None
    _lib = lib
    return lib


def available(*, encode: bool = False) -> bool:
    """Decode needs libde265; encode additionally needs libheif+x265."""
    if _load() is None:
        return False
    if encode:
        return native_heif.available(native_heif.HEVC, encode=True)
    return True


# ------------------------------------------------------------- decode

def decode_annexb_gray(data: bytes, max_frames: int = 1 << 20) -> list:
    """Annex-B HEVC byte stream → list of (h, w) uint8 Y planes.

    Raises ValueError on corrupt input, RuntimeError when libde265 is
    absent. Y is returned as-is (full-range streams round-trip gray
    sources directly; callers owning limited-range content rescale)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libde265 not available")
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise RuntimeError("de265_new_decoder failed")
    frames: list[np.ndarray] = []
    try:
        err = lib.de265_push_data(ctx, bytes(data), len(data), 0, None)
        if err != _DE265_OK:
            raise ValueError(f"de265 push_data error {err}")
        lib.de265_flush_data(ctx)
        more = ctypes.c_int(1)
        stall = 0
        while more.value and len(frames) < max_frames:
            err = lib.de265_decode(ctx, ctypes.byref(more))
            pic = lib.de265_get_next_picture(ctx)
            if pic:
                stall = 0
                w = lib.de265_get_image_width(pic, 0)
                h = lib.de265_get_image_height(pic, 0)
                stride = ctypes.c_int()
                p = lib.de265_get_image_plane(pic, 0, ctypes.byref(stride))
                if not p or w <= 0 or h <= 0:
                    lib.de265_release_next_picture(ctx)
                    raise ValueError("de265: bad picture plane")
                y = (np.ctypeslib.as_array(p, shape=(h * stride.value,))
                     .reshape(h, stride.value)[:, :w].copy())
                frames.append(y)
                lib.de265_release_next_picture(ctx)
            else:
                # after flush, repeated no-output no-error rounds mean
                # the stream ended (or is truncated mid-picture)
                stall += 1
                if err != _DE265_OK or stall > 64:
                    break
        if not frames:
            raise ValueError("de265: no decodable frames in stream")
        return frames
    finally:
        lib.de265_free_decoder(ctx)


# ------------------------------------------------- HEIF NAL extraction

def _find_path(data: bytes, start: int, end: int, *path: bytes):
    """mp4._find with ISO-BMFF fullbox handling for 'meta'."""
    lo, hi = start, end
    for comp in path:
        found = None
        for typ, a, b in _boxes(data, lo, hi):
            if typ == comp:
                found = (a + 4 if comp == b"meta" else a, b)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


def parse_hvcc(h: bytes) -> tuple[list[bytes], int]:
    """hvcC payload → (parameter-set NALs in VPS/SPS/PPS order,
    nal length-prefix size)."""
    if len(h) < 23:
        raise ValueError("hvcC too short")
    length_size = (h[21] & 3) + 1
    psets: list[bytes] = []
    pos = 23
    for _ in range(h[22]):
        pos += 1
        (n,) = struct.unpack_from(">H", h, pos)
        pos += 2
        for _ in range(n):
            (ln,) = struct.unpack_from(">H", h, pos)
            pos += 2
            psets.append(h[pos:pos + ln])
            pos += ln
    return psets, length_size


def build_hvcc(psets: list[bytes], length_size: int = 4) -> bytes:
    """Parameter-set NALs → hvcC payload (profile/level fields copied
    out of the SPS's profile_tier_level, which x265 emits at a fixed
    offset for our single-layer streams)."""
    by_type: dict[int, list[bytes]] = {}
    for p in psets:
        by_type.setdefault((p[0] >> 1) & 0x3F, []).append(p)
    sps = by_type.get(33, [b"\x00" * 20])[0]
    # profile_tier_level starts at SPS payload byte 3 (after nal header
    # 2B + sps_video_parameter_set_id/max_sub_layers/temporal_id byte)
    ptl = sps[3:15] if len(sps) >= 15 else bytes(12)
    out = bytearray()
    out += bytes([1])                           # configurationVersion
    out += ptl[:1]                              # profile_space/tier/idc
    out += ptl[1:5]                             # profile_compatibility
    out += ptl[5:11]                            # constraint flags (48b)
    out += ptl[11:12]                           # level_idc
    out += struct.pack(">H", 0xF000)            # min_spatial_segmentation
    out += bytes([0xFC, 0xFD])                  # parallelismType, chroma
    out += bytes([0xF8, 0xF8])                  # bitdepth luma/chroma - 8
    out += struct.pack(">H", 0)                 # avgFrameRate
    out += bytes([(length_size - 1) | 0x0C])    # constFps/numTL/lenSize
    out += bytes([len(by_type)])
    for t in sorted(by_type):
        arr = by_type[t]
        out += bytes([0x80 | t]) + struct.pack(">H", len(arr))
        for p in arr:
            out += struct.pack(">H", len(p)) + p
    return bytes(out)


def heic_extract_nals(heic: bytes) -> tuple[list[bytes], bytes, int]:
    """HEIC still → (parameter-set NALs, length-prefixed slice sample,
    length-prefix size). The sample is exactly what an mp4 ``hvc1``
    track stores per frame."""
    span = _find_path(heic, 0, len(heic), b"meta", b"iprp", b"ipco",
                      b"hvcC")
    if span is None:
        raise ValueError("heic: no hvcC property")
    psets, length_size = parse_hvcc(heic[span[0]:span[1]])
    span = _find_path(heic, 0, len(heic), b"meta", b"iloc")
    if span is None:
        raise ValueError("heic: no iloc")
    d = heic[span[0]:span[1]]
    ver = d[0]
    pos = 4
    osz, lsz = d[pos] >> 4, d[pos] & 15
    pos += 1
    bsz = d[pos] >> 4
    pos += 1
    (cnt,) = struct.unpack_from(">H", d, pos)
    pos += 2

    def _rd(p: int, size: int) -> tuple[int, int]:
        v = int.from_bytes(d[p:p + size], "big")
        return v, p + size

    parts: list[bytes] = []
    for _ in range(cnt):
        pos += 2                                 # item id
        if ver in (1, 2):
            pos += 2                             # construction method
        pos += 2                                 # data reference index
        base, pos = _rd(pos, bsz)
        (ec,) = struct.unpack_from(">H", d, pos)
        pos += 2
        for _ in range(ec):
            off, pos = _rd(pos, osz)
            ln, pos = _rd(pos, lsz)
            parts.append(heic[base + off:base + off + ln])
        break                                    # primary item only
    if not parts:
        raise ValueError("heic: empty iloc extents")
    return psets, b"".join(parts), length_size


def sample_to_annexb(sample: bytes, psets: list[bytes] | None = None,
                     length_size: int = 4) -> bytes:
    """Length-prefixed mp4 sample → Annex-B; parameter sets, when
    given, are prepended with start codes (IDR stills need them)."""
    out = bytearray()
    for p in psets or ():
        out += b"\x00\x00\x00\x01" + p
    pos = 0
    n = len(sample)
    while pos + length_size <= n:
        ln = int.from_bytes(sample[pos:pos + length_size], "big")
        pos += length_size
        if ln <= 0 or pos + ln > n:
            raise ValueError("bad NAL length in sample")
        out += b"\x00\x00\x00\x01" + sample[pos:pos + ln]
        pos += ln
    return bytes(out)


# ------------------------------------------------------------- encode

def encode_gray_frames(frames, quality: int = 90
                       ) -> tuple[bytes, list[bytes]]:
    """Grayscale (h, w) uint8 frames → (hvcC payload, one
    length-prefixed IDR sample per frame) for an all-intra ``hvc1``
    track. Parameter sets live out-of-band in hvcC (hvc1 semantics);
    x265 emits identical ones for identical settings — verified, and
    any drift falls back to in-band prepend so decode stays correct."""
    if not available(encode=True):
        raise RuntimeError("hevc encode needs libheif(x265) + libde265")
    hvcc = None
    psets0: list[bytes] = []
    samples: list[bytes] = []
    for f in frames:
        a = np.asarray(f)
        if a.ndim != 2 or a.dtype != np.uint8:
            raise ValueError("hevc frames must be (h, w) uint8")
        heic = native_heif.encode(a, quality=quality, codec="heic")
        psets, sample, lsz = heic_extract_nals(heic)
        if lsz != 4:
            # normalize any exotic prefix size to the track's 4 bytes
            sample = b"".join(
                struct.pack(">I", len(n)) + n
                for n in _iter_nals(sample, lsz))
        if hvcc is None:
            hvcc = build_hvcc(psets, 4)
            psets0 = psets
        elif psets != psets0:
            # parameter drift (never observed): carry them in-band
            sample = b"".join(struct.pack(">I", len(p)) + p
                              for p in psets) + sample
        samples.append(sample)
    if hvcc is None:
        raise ValueError("no frames")
    return hvcc, samples


def _iter_nals(sample: bytes, length_size: int):
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos:pos + length_size], "big")
        pos += length_size
        yield sample[pos:pos + ln]
        pos += ln


def encode_mp4_gray(frames, *, fps: float = 12.0, quality: int = 90
                    ) -> bytes:
    """Grayscale (h, w) uint8 frames → complete mp4 with one all-intra
    ``hvc1`` track (hvcC out-of-band in the sample entry, every sample
    a sync sample). The engine's real compressed-video fixture/sink."""
    from .mp4 import write_mp4

    a0 = np.asarray(frames[0])
    hvcc, samples = encode_gray_frames(frames, quality=quality)
    extra = struct.pack(">I", 8 + len(hvcc)) + b"hvcC" + hvcc
    return write_mp4(samples, codec="hvc1", w=int(a0.shape[1]),
                     h=int(a0.shape[0]), fps=fps, keyframe_every=1,
                     sample_entry_extra=extra)


def decode_samples_gray(samples, hvcc: bytes, *,
                        size: tuple | None = None) -> list:
    """mp4 ``hvc1`` samples (+ hvcC payload) → (h, w) uint8 Y planes,
    one per sample. All-intra streams decode each sample independently;
    batching them into one stream amortizes decoder setup.

    ``size=(h, w)`` crops the top-left window: x265 pads pictures below
    its 64-px minimum CTU size without a conformance window (the HEIF
    container crops via ``ispe`` instead), so the mp4 track's declared
    dimensions are authoritative for small frames."""
    psets, length_size = parse_hvcc(hvcc)
    stream = bytearray()
    for p in psets:
        stream += b"\x00\x00\x00\x01" + p
    for s in samples:
        stream += sample_to_annexb(s, None, length_size)
    frames = decode_annexb_gray(bytes(stream))
    if len(frames) != len(samples):
        raise ValueError(
            f"hevc: {len(samples)} samples decoded to {len(frames)} "
            "frames")
    if size is not None:
        h, w = int(size[0]), int(size[1])
        if any(f.shape[0] < h or f.shape[1] < w for f in frames):
            raise ValueError("hevc: decoded picture smaller than track "
                             "dimensions")
        frames = [f[:h, :w] for f in frames]
    return frames
