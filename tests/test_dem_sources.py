"""ENVI hdr/img and SRTM .hgt DEM ingest (raster/dem_formats.py +
sources/dem.py): header semantics vs the reference's parser
(utils/sys/reader.py:14-72 — pixel-center map info shifted res/2 to
corner anchoring), interleaves, hgt corner registration, and the Spark
operators feeding the unchanged slope pipeline.
"""

import numpy as np
import pytest

from gis_tools_spark.raster import codec
from gis_tools_spark.raster import dem_formats as D

HDR = """ENVI
description = {test DEM}
samples = 6
lines = 4
bands = 1
data type = 4
interleave = bsq
byte order = 0
data ignore value = -9999
map info = {Geographic Lat/Lon, 1.0000, 1.0000, 5.0, 45.0, 0.5, 0.25, WGS-84}
"""


def test_parse_hdr_reference_center_shift():
    f = D.parse_hdr(HDR)
    assert (f["x_size"], f["y_size"]) == (6, 4)
    assert f["dtype"] == np.float32
    # reference reader.py:29-35: x_origin = easting - x_res/2,
    # y_origin = northing + y_res/2 (map info is the 1,1 pixel CENTER)
    assert f["gt_x0"] == 5.0 - 0.25 and f["gt_rx"] == 0.5
    assert f["gt_y0"] == 45.0 + 0.125 and f["gt_ry"] == 0.25
    assert f["nodata"] == -9999.0
    assert "Lat/Lon" in f["proj"]


def test_decode_envi_roundtrip_and_interleaves():
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    out, info = D.decode_envi(HDR, arr.tobytes())
    assert np.array_equal(out, arr) and out.dtype == np.float32
    assert info["gt_x0"] == 4.75
    # 3-band, every interleave lands (h, w, b)
    a3 = np.arange(72, dtype=np.int16).reshape(4, 6, 3)
    base = HDR.replace("data type = 4", "data type = 2") \
              .replace("bands = 1", "bands = 3")
    for il, raw in (("bip", a3),
                    ("bil", a3.transpose(0, 2, 1)),
                    ("bsq", a3.transpose(2, 0, 1))):
        hdr = base.replace("interleave = bsq", f"interleave = {il}")
        out, _ = D.decode_envi(hdr, np.ascontiguousarray(raw).tobytes())
        assert np.array_equal(out, a3), il
    # big-endian byte order
    hdr = HDR.replace("byte order = 0", "byte order = 1")
    out, _ = D.decode_envi(hdr, arr.astype(">f4").tobytes())
    assert np.array_equal(out, arr)


def test_decode_envi_truncated_raises():
    with pytest.raises(ValueError):
        D.decode_envi(HDR, b"\x00" * 10)


def _hgt(n=11, lat=44, lon=5, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(-100, 4000, (n, n)).astype(np.int16)
    a[0, 0] = D.SRTM_NODATA
    return f"N{lat:02d}E{lon:03d}", a, a.astype(">i2").tobytes()


def test_decode_hgt_corner_registration():
    name, a, buf = _hgt(11)
    out, info = D.decode_hgt(name, buf)
    assert np.array_equal(out, a)
    res = 1.0 / 10
    # sample centers ON integer degrees: top-left center = (5, 45)
    assert info["gt_x0"] == 5 - res / 2
    assert info["gt_y0"] == 45 + res / 2
    assert info["gt_rx"] == res and info["nodata"] == -32768.0
    # southern/western hemisphere
    out2, info2 = D.decode_hgt("S02W071.hgt", buf)
    assert info2["gt_x0"] == -71 - res / 2
    assert info2["gt_y0"] == -1 + res / 2
    with pytest.raises(ValueError):
        D.decode_hgt("N44E005", buf[:-2])
    with pytest.raises(ValueError):
        D.decode_hgt("tile_7", buf)


def test_hgt_tiles_spark_feeds_slope(spark):
    """hgt blobs → hgt_tiles (zero pixel reads) → codec lazy decode →
    the unchanged slope kernel produces finite values."""
    import pandas as pd

    from gis_tools_spark.raster.kernels import slope_aspect
    from gis_tools_spark.sources.dem import hgt_tiles

    rows = []
    for i, (lat, lon) in enumerate([(44, 5), (44, 6), (45, 5)]):
        name, _a, buf = _hgt(21, lat, lon, seed=i)
        rows.append((name, buf))
    rows.append(("badname", b"\x00" * 10))
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["image_id", "bytes"]))
    tiles = hgt_tiles(df)
    pdf = tiles.toPandas()
    assert list(pdf["ok"]) == [True, True, True, False]
    good = tiles.where("ok")
    # codec dispatch: raw_i16be decodes the ORIGINAL payload bytes
    r = good.orderBy("image_id").limit(1).collect()[0]
    arr = codec.decode(r["bytes"], r["w"], r["h"], "raw_i16be")
    assert arr.dtype == np.int16 and arr.shape == (21, 21)
    out = slope_aspect(good).toPandas()
    assert len(out) == 3
    for b in out["bytes"]:
        s = codec.decode_raw_f32(b, 21, 21)
        assert np.isfinite(s[s != codec.NO_DATA_F32]).all()


def test_envi_tiles_spark(spark):
    import pandas as pd

    from gis_tools_spark.sources.dem import envi_tiles

    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "b"],
        "hdr": [HDR, "garbage"],
        "bytes": [arr.tobytes(), b"xx"]}))
    out = envi_tiles(df).orderBy("image_id").toPandas()
    assert list(out["ok"]) == [True, False]
    dec = codec.decode_raw_f32(out["bytes"][0], 6, 4)
    assert np.array_equal(dec, arr)
    assert out["gt_x0"][0] == 4.75 and out["gt_ry"][0] == 0.25
