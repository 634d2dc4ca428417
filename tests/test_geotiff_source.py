"""GeoTIFF ingest/egress operators (sources/geotiff.py): tile-table
roundtrip, tags-only metadata extraction, corrupt-blob marking, and
value-identity of the zonal pipeline over fmt='geotiff' vs raw_f32.

Reference parity: gis-tools RasterMap = GDAL GeoTIFF open →
GetGeoTransform/ReadAsArray (/root/reference/gistools/raster.py:158-165).
"""

import numpy as np
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.sources.geotiff import geotiff_tiles, to_geotiff


@pytest.fixture(scope="module")
def tiles_pdf():
    return fixtures.gen_rasters_exact(2, 2, 32)


def test_roundtrip_preserves_geo_and_pixels(spark, tiles_pdf):
    ras = spark.createDataFrame(tiles_pdf)
    blobs = to_geotiff(ras, epsg=4326)
    out = geotiff_tiles(blobs).orderBy("image_id").toPandas()
    src = tiles_pdf.sort_values("image_id").reset_index(drop=True)
    assert list(out["ok"]) == [True] * len(src)
    assert list(out["epsg"]) == [4326] * len(src)
    for c in ("gt_x0", "gt_rx", "gt_y0", "gt_ry"):
        assert np.allclose(out[c], src[c], rtol=0, atol=0)
    from gis_tools_spark.raster import codec

    for i in range(len(src)):
        a = codec.decode(out["bytes"][i], int(out["w"][i]),
                         int(out["h"][i]), "geotiff")
        b = codec.decode(src["bytes"][i], int(src["w"][i]),
                         int(src["h"][i]), "raw_f32")
        assert np.array_equal(a, b)


def test_corrupt_blob_marked_not_fatal(spark):
    pdf = fixtures.gen_rasters_exact(1, 1, 16)
    import pandas as pd

    from gis_tools_spark.raster import geotiff

    good = geotiff.encode(np.zeros((4, 4), np.float32), gt=(0, 1, 0, 1))
    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["good", "bad", "trunc"],
        "bytes": [good, b"not a tiff", good[:30]]}))
    out = geotiff_tiles(df).orderBy("image_id").toPandas()
    by = dict(zip(out["image_id"], out["ok"]))
    assert by == {"good": True, "bad": False, "trunc": False}


def test_zonal_pipeline_identical_over_geotiff(spark, tiles_pdf):
    """The whole raster operator family runs unchanged on
    fmt='geotiff' tiles: zonal stats value-identical to raw_f32."""
    from gis_tools_spark.raster.zonal import zonal_statistics

    ras = spark.createDataFrame(tiles_pdf)
    zones = spark.createDataFrame(
        fixtures.gen_zones(8)[["gid", "geometry_wkb"]])
    base = zonal_statistics(ras, zones).orderBy("gid").toPandas()
    tiles = geotiff_tiles(to_geotiff(ras)).where("ok")
    via = zonal_statistics(tiles, zones).orderBy("gid").toPandas()
    assert len(base) == len(via)
    for c in ("zonal_count", "no_data_count"):
        assert list(base[c]) == list(via[c])
    for c in ("zonal_min", "zonal_max", "zonal_mean"):
        assert np.allclose(base[c], via[c], rtol=0, atol=0)
