"""MPEG Layer III codec tests (gis_tools_spark/raster/mp3.py).

No third-party MP3 codec exists in this sandbox, so conformance is
established structurally (see mp3.py docstring): complete-prefix-code
Huffman validation, prototype spectrum, filterbank perfect
reconstruction, encode->decode round trips across the feature matrix,
and one real-world third-party stream that ships with the OS image.
"""

import os

import numpy as np
import pytest

from gis_tools_spark.raster import mp3, mp3_tables as T
from gis_tools_spark.raster.media import audio_features, decode_audio
from gis_tools_spark import fixtures

EXTERNAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
                "test_data/test.mp3")


# --------------------------------------------------------------- tables

def test_huffman_tables_are_complete_prefix_codes():
    assert T.validate_huffman_tables() == []


def test_escape_tables_not_shipped():
    for tid in range(16, 32):
        assert tid not in T.HUFF_BIG
        assert tid in T.ESCAPE_LINBITS


def test_scalefactor_band_tables():
    for sr, t in T.SFB_LONG.items():
        assert len(t) == 23 and t[0] == 0 and t[-1] == 576
        assert all(b > a for a, b in zip(t, t[1:]))
    for sr, t in T.SFB_SHORT.items():
        assert len(t) == 14 and t[0] == 0 and t[-1] == 192
        assert all(b > a for a, b in zip(t, t[1:]))


def test_prototype_window():
    h = T.prototype_filter()
    # smoothness: a single mistyped integer spikes the 2nd difference
    d2 = np.diff(np.asarray(T._PROTO_HALF, dtype=np.float64), 2)
    assert np.max(np.abs(d2)) < 100
    # spectrum: lowpass with half-power at pi/64, stopband < -100 dB
    H = np.fft.rfft(h, 16384)
    mag = 20 * np.log10(np.abs(H) / np.abs(H).max() + 1e-300)
    assert abs(mag[128] + 3.01) < 0.1          # band edge = pi/64
    assert mag[384:].max() < -100.0


def test_filterbank_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(32 * 200)
    S = mp3.analysis_filterbank(x)
    y = mp3._Synth().run(S)
    d = 481                                     # analysis+synthesis delay
    seg = slice(0, 32 * 200 - d - 600)
    err = y[d:][seg] - x[seg]
    snr = 10 * np.log10(np.mean(x[seg] ** 2) / np.mean(err ** 2))
    assert snr > 80.0


# --------------------------------------------------------------- round trips

def _best_snr(x, pcm, maxd=2600):
    best = (1e18, 0)
    for d in range(maxd):
        nn = min(len(pcm) - d, len(x))
        if nn < 3000:
            continue
        e = np.mean((pcm[d:d + nn] - x[:nn]) ** 2)
        if e < best[0]:
            best = (e, d)
    e, d = best
    nn = min(len(pcm) - d, len(x))
    return 10 * np.log10(np.mean(x[:nn] ** 2) / max(e, 1e-30))


def _tone(sr, secs=0.6, f=330.0, amp=0.4):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * f * t)


def test_roundtrip_mono_long():
    x = _tone(44100)
    pcm, sr = mp3.decode(mp3.encode(x, 44100))
    assert sr == 44100
    assert _best_snr(x, pcm) > 15.0


def test_roundtrip_short_block_cycle():
    x = _tone(44100)
    buf = mp3.encode(x, 44100, block_pattern="cycle")
    pcm, _ = mp3.decode(buf)
    assert _best_snr(x, pcm) > 14.0


def test_roundtrip_stereo_and_ms():
    t = np.arange(24000) / 44100
    xs = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                   0.3 * np.sin(2 * np.pi * 660 * t)], axis=1)
    for ms in (False, True):
        pcm, _ = mp3.decode(mp3.encode(xs, 44100, bitrate=192000, ms=ms))
        assert pcm.shape[1] == 2
        assert _best_snr(xs[:, 0], pcm[:, 0]) > 14.0
        assert _best_snr(xs[:, 1], pcm[:, 1]) > 14.0


@pytest.mark.parametrize("sr,br", [(48000, 160000), (32000, 128000),
                                   (22050, 64000), (16000, 48000),
                                   (11025, 32000), (8000, 24000)])
def test_roundtrip_all_sample_rate_families(sr, br):
    x = _tone(sr)
    buf = mp3.encode(x, sr, bitrate=br)
    info = mp3.probe(buf)
    assert info["sample_rate"] == sr
    assert info["lsf"] == (sr < 32000)
    pcm, got_sr = mp3.decode(buf)
    assert got_sr == sr
    assert _best_snr(x, pcm) > 14.0


def test_quantizer_never_needs_escape_tables():
    rng = np.random.default_rng(7)
    x = np.clip(rng.standard_normal(576 * 4), -1, 1)
    gg, ix = mp3._quantize(x)
    assert np.abs(ix).max() <= 15


def test_escape_table_stream_raises_not_corrupts():
    # Patch a frame's first table_select (mono MPEG-1 side info: the
    # field starts 9+5+4+12+9+8+4+1 = 52 bits into the side info) to 16.
    x = _tone(44100, secs=0.2)
    buf = bytearray(mp3.encode(x, 44100))
    side_off = 4
    bitpos = 52
    # set the 5-bit field at bitpos to 16 (binary 10000)
    for k, bit in enumerate((1, 0, 0, 0, 0)):
        p = bitpos + k
        byte, sh = side_off + p // 8, 7 - p % 8
        buf[byte] = (buf[byte] & ~(1 << sh)) | (bit << sh)
    with pytest.raises(mp3.Mp3Unsupported, match="escape table 16"):
        mp3.decode(bytes(buf))


# --------------------------------------------------------------- external stream

@pytest.mark.skipif(not os.path.exists(EXTERNAL_MP3),
                    reason="OS-image sample not present")
def test_external_real_world_stream():
    data = open(EXTERNAL_MP3, "rb").read()
    info = mp3.probe(data)
    assert info == {"version": 2, "sample_rate": 22050, "bitrate": 64000,
                    "channels": 1, "mode": 3, "lsf": True, "frames": 45,
                    "samples": 25920,
                    "duration_s": pytest.approx(25920 / 22050)}
    pcm, sr = mp3.decode(data)
    assert sr == 22050 and pcm.shape == (25920,)
    # the file is digital silence: every frame's part2_3_length is 0,
    # so a correct decode is EXACTLY zero (any table/window/bit error
    # upstream of the filterbank would show up as nonzero output)
    assert np.abs(pcm).max() == 0.0


# --------------------------------------------------------------- pipeline wiring

def test_decode_audio_mp3_and_features(spark):
    aud = fixtures.gen_audio(n=12)
    mp3_rows = aud[aud.fmt == "mp3"]
    assert len(mp3_rows) == 2
    x = decode_audio(mp3_rows.iloc[0]["bytes"], "mp3")
    assert x.ndim == 1 and len(x) >= 4000
    out = audio_features(spark.createDataFrame(mp3_rows)).toPandas()
    assert len(out) == 2 and (out["rms"] > 0).all()
