"""WAV/AIFF container conformance vs the Python stdlib (wave, aifc) —
independent third-party implementations of both formats — plus
encode/decode round-trips across the supported payload matrix."""

import io
import struct
import warnings

import numpy as np
import pytest

from gis_tools_spark.raster import wavaiff as W

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import aifc
    import wave


class _KeepOpen(io.BytesIO):
    # aifc.close() closes the underlying file; keep the buffer readable
    def close(self):
        pass


def _sig(n=700, ch=1, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    x = np.clip(x, -0.999, 0.999)
    if ch > 1:
        x = np.stack([x * (0.5 + 0.5 * c / ch) for c in range(ch)], axis=1)
    return x


# ---------------------------------------------------------------- WAV

@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("bps", [16, 24])
def test_wav_stdlib_reads_ours(ch, bps):
    x = _sig(ch=ch)
    buf = W.encode_wav(x, 8000, bps=bps)
    with wave.open(io.BytesIO(buf)) as w:
        assert w.getnchannels() == ch
        assert w.getframerate() == 8000
        assert w.getsampwidth() == bps // 8
        raw = w.readframes(w.getnframes())
    # stdlib's raw frames must equal our own payload decode
    ours, sr = W.decode_wav(buf)
    theirs = W._pcm_int_to_float(raw, bps, little=True)
    if ch > 1:
        theirs = theirs.reshape(-1, ch)
    assert sr == 8000
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("sw", [1, 2, 4])
def test_wav_we_read_stdlib(ch, sw):
    x = _sig(ch=ch)
    scale = float(1 << (8 * sw - 1))
    v = np.clip(np.rint(x.reshape(-1) * scale), -scale, scale - 1)
    if sw == 1:
        raw = (v.astype(np.int64) + 128).astype(np.uint8).tobytes()
    else:
        raw = v.astype(f"<i{sw}").tobytes()
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sw)
        w.setframerate(44100)
        w.writeframes(raw)
    got, sr = W.decode_wav(bio.getvalue())
    assert sr == 44100
    want = v / scale
    if ch > 1:
        want = want.reshape(-1, ch)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_wav_float32_and_float64():
    x = _sig()
    buf = W.encode_wav(x, 16000, float32=True)
    got, sr = W.decode_wav(buf)
    assert sr == 16000
    np.testing.assert_allclose(got, x, atol=1e-6)
    # hand-build a float64 WAV
    payload = x.astype("<f8").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 8, 8, 64)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got, _ = W.decode_wav(buf)
    np.testing.assert_array_equal(got, x)


def test_wav_extensible_unwraps():
    x = _sig()
    buf = W.encode_wav(x, 8000, bps=16)
    # rewrap the fmt chunk as WAVE_FORMAT_EXTENSIBLE
    i = buf.index(b"fmt ")
    (flen,) = struct.unpack("<I", buf[i + 4 : i + 8])
    old = buf[i + 8 : i + 8 + flen]
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71])
    new = struct.pack("<H", 0xFFFE) + old[2:16] + struct.pack(
        "<HHI", 22, 16, 0x3) + guid
    buf2 = buf[:i] + b"fmt " + struct.pack("<I", len(new)) + new \
        + buf[i + 8 + flen:]
    got, sr = W.decode_wav(buf2)
    want, _ = W.decode_wav(buf)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------- AIFF

@pytest.mark.parametrize("ch", [1, 2])
def test_aiff_stdlib_reads_ours(ch):
    x = _sig(ch=ch)
    buf = W.encode_aiff(x, 22050, bps=16)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        with aifc.open(io.BytesIO(buf)) as a:
            assert a.getnchannels() == ch
            assert a.getframerate() == 22050
            assert a.getsampwidth() == 2
            raw = a.readframes(a.getnframes())
    ours, sr = W.decode_aiff(buf)
    theirs = W._pcm_int_to_float(raw, 16, little=False)
    if ch > 1:
        theirs = theirs.reshape(-1, ch)
    assert sr == 22050
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("ch,sw", [(1, 1), (1, 2), (2, 2), (1, 4)])
def test_aiff_we_read_stdlib(ch, sw):
    x = _sig(ch=ch)
    scale = float(1 << (8 * sw - 1))
    v = np.clip(np.rint(x.reshape(-1) * scale), -scale, scale - 1)
    raw = v.astype(f">i{sw}").tobytes()
    bio = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        with aifc.open(bio, "wb") as a:
            a.setnchannels(ch)
            a.setsampwidth(sw)
            a.setframerate(11025)
            a.writeframes(raw)
    got, sr = W.decode_aiff(bio.getvalue())
    assert sr == 11025
    want = v / scale
    if ch > 1:
        want = want.reshape(-1, ch)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_aifc_sowt_and_fl32():
    x = _sig()
    v = np.clip(np.rint(x * 32768.0), -32768, 32767)
    for comp, raw in [
        (b"sowt", v.astype("<i2").tobytes()),
        (b"fl32", x.astype(">f4").tobytes()),
    ]:
        comm = struct.pack(">HIH", 1, len(x), 16 if comp == b"sowt" else 32)
        comm += W._write_ext80(48000.0) + comp + b"\x05none\x00"
        ssnd = struct.pack(">II", 0, 0) + raw
        body = b"COMM" + struct.pack(">I", len(comm)) + comm
        body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        buf = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFC" + body
        got, sr = W.decode_aiff(buf)
        assert sr == 48000
        if comp == b"sowt":
            np.testing.assert_allclose(got, v / 32768.0, atol=1e-9)
        else:
            np.testing.assert_allclose(got, x, atol=1e-6)


def test_ext80_roundtrip():
    for sr in [8000.0, 11025.0, 22050.0, 44100.0, 48000.0, 96000.0, 1.0]:
        assert W._read_ext80(W._write_ext80(sr)) == sr
    # cross-check against aifc's own 80-bit writer
    bio = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        with aifc.open(bio, "wb") as a:
            a.setnchannels(1)
            a.setsampwidth(2)
            a.setframerate(44100)
            a.writeframes(b"\x00\x00")
    raw = bio.getvalue()
    i = raw.index(b"COMM")
    assert W._read_ext80(raw[i + 16 : i + 26]) == 44100.0


def test_corrupt_raises():
    with pytest.raises(ValueError):
        W.decode_wav(b"nope")
    with pytest.raises(ValueError):
        W.decode_aiff(b"FORMxxxxAIFF")
    with pytest.raises(ValueError):
        W.decode_wav(b"RIFF\x00\x00\x00\x00WAVE")
