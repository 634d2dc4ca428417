"""WAV (RIFF) and AIFF/AIFF-C audio containers, from scratch.

Decode: WAV PCM 8/16/24/32-bit integer, IEEE float32/float64, and
WAVE_FORMAT_EXTENSIBLE wrapping either; AIFF and AIFF-C big-endian PCM
8/16/24/32 plus the ``sowt`` (byte-swapped 16-bit) and ``fl32``/``FL32``
float compression ids.  Encode: WAV (pcm16 / pcm24 / float32) and AIFF
(pcm16 / pcm24).  All payload work is numpy-vectorized; only the chunk
walk is scalar Python.

Conformance: the Python standard library ships independent third-party
implementations of both containers (``wave``, ``aifc``), and the test
suite round-trips against them in BOTH directions (their output decoded
by this module, this module's output parsed by them), including the
80-bit extended-precision sample-rate field AIFF uses in its COMM
chunk.

Reference semantics: gis-tools has no audio operators; this module
serves the multimodal-pipeline audio path (raster/media.py
decode_audio) alongside the from-scratch MP3 and FLAC codecs.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


# --------------------------------------------------------------- helpers

def _pcm_int_to_float(raw: bytes, bps: int, little: bool) -> np.ndarray:
    """Interleaved signed PCM bytes -> float64 in [-1, 1)."""
    order = "<" if little else ">"
    if bps == 8:
        # WAV 8-bit is unsigned; AIFF 8-bit is signed (handled by caller)
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        return (a - 128.0) / 128.0
    if bps == 16:
        return np.frombuffer(raw, dtype=f"{order}i2").astype(np.float64) / 32768.0
    if bps == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        n = len(b) // 3
        b = b[: n * 3].reshape(n, 3).astype(np.uint32)
        if little:
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        else:
            v = b[:, 2] | (b[:, 1] << 8) | (b[:, 0] << 16)
        v = v.astype(np.int32)
        v -= (v >> 23) << 24  # sign-extend 24 -> 32
        return v.astype(np.float64) / 8388608.0
    if bps == 32:
        return np.frombuffer(raw, dtype=f"{order}i4").astype(np.float64) / 2147483648.0
    raise WavError(f"unsupported PCM bit depth {bps}")


def _float_to_pcm_int(x: np.ndarray, bps: int, little: bool) -> bytes:
    scale = float(1 << (bps - 1))
    v = np.clip(np.rint(x * scale), -scale, scale - 1).astype(np.int64)
    if bps == 16:
        return v.astype("<i2" if little else ">i2").tobytes()
    if bps == 24:
        u = (v & 0xFFFFFF).astype(np.uint32)
        out = np.empty((len(u), 3), dtype=np.uint8)
        lo, mid, hi = u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF
        if little:
            out[:, 0], out[:, 1], out[:, 2] = lo, mid, hi
        else:
            out[:, 0], out[:, 1], out[:, 2] = hi, mid, lo
        return out.tobytes()
    raise WavError(f"unsupported encode bit depth {bps}")


def _read_ext80(b: bytes) -> float:
    """80-bit IEEE 754 extended-precision big-endian -> float (the AIFF
    COMM sample-rate field)."""
    if len(b) != 10:
        raise WavError("extended float must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise WavError("inf/nan sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_ext80(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    # normalize mantissa into [2^63, 2^64)
    while x < 2.0**63:
        x *= 2.0
        exp -= 1
    while x >= 2.0**64:
        x /= 2.0
        exp += 1
    return struct.pack(">HQ", sign | exp, int(x))


# --------------------------------------------------------------- WAV

_WAVE_PCM = 1
_WAVE_FLOAT = 3
_WAVE_EXTENSIBLE = 0xFFFE


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (float64 samples shaped (n,) mono or (n, ch),
    sample_rate)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    tag, ch, sr, _br, _ba, bps = struct.unpack("<HHIIHH", fmt[:16])
    if tag == _WAVE_EXTENSIBLE:
        if len(fmt) < 40:
            raise WavError("truncated WAVE_FORMAT_EXTENSIBLE")
        # SubFormat GUID: first 2 bytes are the wrapped format tag
        (tag,) = struct.unpack("<H", fmt[24:26])
    if ch < 1:
        raise WavError("zero channels")
    if tag == _WAVE_FLOAT:
        if bps == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bps == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise WavError(f"float WAV with bps={bps}")
    elif tag == _WAVE_PCM:
        x = _pcm_int_to_float(data, bps, little=True)
    else:
        raise WavError(f"unsupported WAV format tag {tag}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch)
    return x, int(sr)


def encode_wav(x: np.ndarray, sr: int, *, bps: int = 16,
               float32: bool = False) -> bytes:
    """float samples (n,) or (n, ch) -> RIFF/WAVE bytes."""
    x = np.asarray(x, dtype=np.float64)
    ch = 1 if x.ndim == 1 else x.shape[1]
    flat = x.reshape(-1)
    if float32:
        payload, tag, bps = flat.astype("<f4").tobytes(), _WAVE_FLOAT, 32
    else:
        payload, tag = _float_to_pcm_int(flat, bps, little=True), _WAVE_PCM
    ba = ch * bps // 8
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * ba, ba, bps)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --------------------------------------------------------------- AIFF

def decode_aiff(buf: bytes) -> tuple[np.ndarray, int]:
    """AIFF / AIFF-C -> (float64 samples, sample_rate).  Compression
    ids: NONE (and AIFF classic), sowt, fl32/FL32."""
    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] not in (b"AIFF", b"AIFC"):
        raise WavError("not an AIFF/AIFC stream")
    is_aifc = buf[8:12] == b"AIFC"
    pos, end = 12, min(len(buf), 8 + struct.unpack(">I", buf[4:8])[0])
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack(">I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen & 1)
    if comm is None or ssnd is None:
        raise WavError("missing COMM/SSND chunk")
    ch, _nframes, bps = struct.unpack(">HIH", comm[:8])
    sr = _read_ext80(comm[8:18])
    comp = comm[18:22] if (is_aifc and len(comm) >= 22) else b"NONE"
    off, _blk = struct.unpack(">II", ssnd[:8])
    raw = ssnd[8 + off :]
    if comp in (b"NONE",):
        if bps == 8:
            a = np.frombuffer(raw, dtype=np.int8).astype(np.float64)
            x = a / 128.0
        else:
            x = _pcm_int_to_float(raw, bps, little=False)
    elif comp == b"sowt":
        x = _pcm_int_to_float(raw, 16, little=True)
    elif comp in (b"fl32", b"FL32"):
        x = np.frombuffer(raw, dtype=">f4").astype(np.float64)
    else:
        raise WavError(f"unsupported AIFC compression {comp!r}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch)
    return x, int(round(sr))


def encode_aiff(x: np.ndarray, sr: int, *, bps: int = 16) -> bytes:
    """float samples -> classic big-endian AIFF PCM."""
    x = np.asarray(x, dtype=np.float64)
    ch = 1 if x.ndim == 1 else x.shape[1]
    nframes = len(x)
    payload = _float_to_pcm_int(x.reshape(-1), bps, little=False)
    comm = struct.pack(">HIH", ch, nframes, bps) + _write_ext80(float(sr))
    ssnd = struct.pack(">II", 0, 0) + payload
    body = b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        body += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
