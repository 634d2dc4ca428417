"""Compressed HEVC video through system codec libraries
(raster/native_hevc.py): encode via libheif/x265 per-frame IDR stills,
package as an mp4 ``hvc1`` track, decode via libde265 — two
independent codec implementations cross-checking each other.

Reference parity: gis-tools has no video ops; this serves the build
brief's multimodal scope (frame sampling over a web crawl, where real
video is compressed). Tests skip cleanly when either library is
absent — the engine then raises its honest NotImplementedError.
"""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.raster import mp4 as M
from gis_tools_spark.raster import native_hevc as NH
from gis_tools_spark.raster.media import sample_video_frames

HAVE = NH.available() and NH.available(encode=True)

pytestmark = pytest.mark.skipif(not HAVE, reason="libde265/libheif absent")


def _photo_frames(n, h, w, seed=0):
    """Smooth photo-like gray frames so lossy PSNR is meaningful."""
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 4 * np.pi, h)
    prng = np.random.default_rng(seed)
    out = []
    for k in range(n):
        f = 127 + 80 * np.sin(x[None, :] * prng.uniform(0.4, 1.1) + k * 0.7) \
            * np.cos(y[:, None] * prng.uniform(0.4, 1.1) + k)
        out.append(np.clip(f, 0, 255).astype(np.uint8))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_sample_roundtrip_psnr():
    frames = _photo_frames(4, 64, 80)
    hvcc, samples = NH.encode_gray_frames(frames, quality=90)
    dec = NH.decode_samples_gray(samples, hvcc, size=(64, 80))
    assert len(dec) == 4
    for f, d in zip(frames, dec):
        assert d.shape == f.shape
        assert _psnr(f, d) >= 40.0


def test_all_intra_subset_decode_is_independent():
    """Sampling frame k must not depend on frames not kept — decode of
    a sample subset equals the same frames from a full decode."""
    frames = _photo_frames(6, 48, 48, seed=3)
    hvcc, samples = NH.encode_gray_frames(frames, quality=85)
    full = NH.decode_samples_gray(samples, hvcc)
    sub = NH.decode_samples_gray([samples[1], samples[4]], hvcc)
    assert (sub[0] == full[1]).all() and (sub[1] == full[4]).all()


def test_mp4_hvc1_container_contract():
    frames = _photo_frames(5, 32, 40, seed=1)
    buf = NH.encode_mp4_gray(frames, fps=10.0, quality=90)
    info = M.probe(buf)
    v = next(t for t in info["tracks"] if t["kind"] == "vide")
    assert v["codec"] == "hvc1"
    assert v["n_samples"] == 5 and v["w"] == 40 and v["h"] == 32
    st = M.sample_table(buf, v["track_id"])
    assert st["keyframe"].all()          # all-intra: every sample sync
    hvcc = M.sample_entry_config(buf, b"hvcC", v["track_id"])
    psets, lsz = NH.parse_hvcc(hvcc)
    assert lsz == 4 and len(psets) >= 3  # VPS+SPS+PPS


def test_spark_frame_sampling_decodes_hvc1(spark):
    frames = _photo_frames(10, 24, 32, seed=2)
    buf = NH.encode_mp4_gray(frames, fps=5.0, quality=90)
    pdf = pd.DataFrame({"video_id": ["v0"], "bytes": [buf],
                        "n_frames": [10], "w": [32], "h": [24],
                        "fmt": ["mp4"], "fps": [5.0]})
    out = sample_video_frames(spark.createDataFrame(pdf),
                              every_n=4).toPandas()
    assert sorted(out["frame_index"]) == [0, 4, 8]
    assert (out["fmt"] == "raw_gray").all()
    for _, r in out.iterrows():
        dec = np.frombuffer(bytes(r["bytes"]), np.uint8).reshape(24, 32)
        assert _psnr(frames[int(r["frame_index"])], dec) >= 40.0


def test_corrupt_payload_raises_valueerror():
    frames = _photo_frames(2, 32, 32)
    hvcc, samples = NH.encode_gray_frames(frames)
    with pytest.raises(ValueError):
        NH.decode_samples_gray([samples[0][:8]], hvcc)
    with pytest.raises(ValueError):
        NH.decode_annexb_gray(b"\x00\x00\x00\x01" + b"\xff" * 40)
