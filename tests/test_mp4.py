"""ISO-BMFF container tests (raster/mp4.py): writer->reader roundtrip,
hand-built 64-bit / version-1 boxes the writer cannot emit, the Spark
probe operator's crawl contract, and the honest codec raise."""

import struct

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.raster import mp4 as M
from gis_tools_spark.raster.media import sample_video_frames


def _frames(n=20):
    return [bytes([i]) * (40 + 7 * i) for i in range(n)]


def test_probe_and_sample_table_roundtrip():
    fr = _frames()
    buf = M.write_mp4(fr, w=8, h=5, fps=10.0, keyframe_every=6,
                      chunk_sizes=(3, 5, 2))
    info = M.probe(buf)
    assert info["brand"] == "isom"
    v = info["tracks"][0]
    assert (v["kind"], v["codec"], v["w"], v["h"], v["n_samples"]) == \
        ("vide", "rawg", 8, 5, 20)
    assert v["duration_s"] == pytest.approx(2.0)
    st = M.sample_table(buf)
    assert [int(s) for s in st["sizes"]] == [len(f) for f in fr]
    assert M.extract_samples(buf, range(20)) == fr
    assert np.nonzero(st["keyframe"])[0].tolist() == [0, 6, 12, 18]
    assert st["dts"].tolist() == [i * 120 for i in range(20)]


def test_co64_and_version1_boxes():
    """Reader-only features: replace stco with co64 and mvhd/mdhd v0
    with v1 in a written file; the parser must read both layouts."""
    fr = _frames(6)
    buf = bytearray(M.write_mp4(fr, w=4, h=4, fps=6.0, chunk_sizes=(6,)))
    # locate stco and rewrite as co64 (one chunk)
    i = bytes(buf).index(b"stco") - 4
    size = int.from_bytes(buf[i:i + 4], "big")
    ver_flags = buf[i + 8:i + 12]
    count = int.from_bytes(buf[i + 12:i + 16], "big")
    assert count == 1
    off = int.from_bytes(buf[i + 16:i + 20], "big")
    co64 = (struct.pack(">I", 8 + 4 + 4 + 8) + b"co64" + ver_flags
            + struct.pack(">IQ", 1, off + 4))   # box grows by 4 bytes
    out = bytes(buf[:i]) + co64 + bytes(buf[i + size:])
    # stbl/minf/mdia/trak/moov ancestor sizes all grew by 4
    out = bytearray(out)
    for anc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = bytes(out).index(anc) - 4
        sz = int.from_bytes(out[j:j + 4], "big")
        out[j:j + 4] = struct.pack(">I", sz + 4)
    st = M.sample_table(bytes(out))
    # co64 offset was written +4 to track the mdat shift: exact slice
    assert M.extract_samples(bytes(out), [2]) == [fr[2]]
    assert [int(s) for s in st["sizes"]] == [len(f) for f in fr]
    # version-1 mvhd: parser reads 64-bit duration
    buf2 = bytearray(M.write_mp4(fr, w=4, h=4, fps=6.0))
    k = bytes(buf2).index(b"mvhd") + 4
    payload = buf2[k:k + 4 + 20 + 6]
    ts = int.from_bytes(buf2[k + 12:k + 16], "big")
    dur = int.from_bytes(buf2[k + 16:k + 20], "big")
    v1 = (bytes([1]) + b"\x00\x00\x00" + b"\x00" * 16
          + struct.pack(">I", ts) + struct.pack(">Q", dur))
    # build a synthetic mvhd v1 payload and parse it directly
    fake = bytearray(64)
    fake[:len(v1)] = v1
    got_ts, got_dur = M._mvhd_like(bytes(fake), 0, len(fake))
    assert (got_ts, got_dur) == (ts, dur)


def test_not_mp4_raises():
    with pytest.raises(M.Mp4Error):
        M.probe(b"\x00" * 64)
    with pytest.raises(M.Mp4Error):
        M.probe(b"RIFFxxxxWEBP" + b"\x00" * 32)


def test_video_probe_spark_crawl_contract(spark):
    vids = fixtures.gen_videos(n=4, n_frames=8, w=8, h=6)
    pdf = vids[vids.fmt == "mp4"][["video_id", "bytes"]].copy()
    pdf.loc[len(pdf)] = ["corrupt", b"this is not an mp4 container"]
    out = M.video_probe(spark.createDataFrame(pdf)).toPandas() \
        .set_index("video_id")
    assert bool(out.loc["corrupt", "ok"]) is False
    good = out[out.ok]
    assert len(good) == 2
    # vid3 is a real hvc1 track when the system codecs are present
    assert set(good["codec"]) <= {"rawg", "hvc1"}
    if fixtures._hevc_ok():
        assert set(good["codec"]) == {"rawg", "hvc1"}
    assert (good["n_frames"] == 8).all()
    assert (good["w"] == 8).all() and (good["h"] == 6).all()
    assert (good["duration_s"] > 0.5).all()


def test_mp4_frame_sampling_feeds_image_ops(spark):
    vids = fixtures.gen_videos(n=2, n_frames=10, w=16, h=8)
    mp4_rows = vids[vids.fmt == "mp4"]
    assert len(mp4_rows) == 1
    out = sample_video_frames(spark.createDataFrame(mp4_rows),
                              every_n=5).toPandas()
    assert sorted(out["frame_index"]) == [0, 5]
    assert (out["fmt"] == "raw_gray").all()
    assert len(bytes(out.iloc[0]["bytes"])) == 16 * 8


def test_compressed_codec_raises_in_sampler(spark):
    buf = M.write_mp4(_frames(4), codec="avc1", w=4, h=4, fps=4.0)
    pdf = pd.DataFrame({"video_id": ["v"], "bytes": [buf], "n_frames": [4],
                        "w": [4], "h": [4], "fmt": ["mp4"], "fps": [4.0]})
    with pytest.raises(Exception, match="avc1"):
        sample_video_frames(spark.createDataFrame(pdf),
                            every_n=2).toPandas()
    # but the probe still reads its metadata (the crawl-side op)
    out = M.video_probe(spark.createDataFrame(pdf)).toPandas()
    assert bool(out.iloc[0]["ok"]) and out.iloc[0]["codec"] == "avc1"
