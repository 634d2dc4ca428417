"""Vector→raster tile burning vs direct rasterize oracle."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.geom import wkb
from gis_tools_spark.raster import codec
from gis_tools_spark.raster.burn import burn_zones_to_tiles
from gis_tools_spark.raster.zonal import pixel_centers, rasterize_mask


def _tiles_df(spark):
    rows = []
    # 2x2 tiles of 16x16 px over [0,2]x[0,2]
    for ty in range(2):
        for tx in range(2):
            rows.append((f"t{tx}{ty}", 16, 16, tx * 1.0, 1 / 16, 2.0 - ty * 1.0, 1 / 16))
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["image_id", "w", "h", "gt_x0", "gt_rx", "gt_y0", "gt_ry"]))


def test_burn_matches_rasterize_oracle(spark):
    tiles = _tiles_df(spark)
    zones = spark.createDataFrame(pd.DataFrame({
        "gid": [1, 2],
        "val": [10.0, 20.0],
        "geometry_wkb": [wkb.box(0.25, 0.25, 1.5, 1.5),
                         wkb.box(1.2, 1.2, 1.9, 1.9)],
    }))
    out = burn_zones_to_tiles(tiles, zones, burn_attr="val", background=-1.0).toPandas()
    assert len(out) == 4
    tl = tiles.toPandas().set_index("image_id")
    zpd = [(1, 10.0, wkb.decode(wkb.box(0.25, 0.25, 1.5, 1.5))),
           (2, 20.0, wkb.decode(wkb.box(1.2, 1.2, 1.9, 1.9)))]
    for _, r in out.iterrows():
        got = codec.decode_raw_f32(r["bytes"], 16, 16)
        t = tl.loc[r["image_id"]]
        xs, ys = pixel_centers(t["gt_x0"], t["gt_rx"], t["gt_y0"], t["gt_ry"], 16, 16)
        want = np.full((16, 16), -1.0, dtype=np.float32)
        for gid, val, g in zpd:  # burn in gid order, later wins
            m = rasterize_mask(g, xs, ys)
            want[m] = val
        assert np.array_equal(got, want), r["image_id"]


def test_burn_value_and_empty_tiles(spark):
    tiles = _tiles_df(spark)
    zones = spark.createDataFrame(pd.DataFrame({
        "gid": [1], "geometry_wkb": [wkb.box(0.1, 1.6, 0.4, 1.9)]}))
    out = burn_zones_to_tiles(tiles, zones, burn_value=7.0).toPandas()
    assert len(out) == 4  # empty tiles kept
    tot = 0
    for _, r in out.iterrows():
        a = codec.decode_raw_f32(r["bytes"], 16, 16)
        tot += (a == 7.0).sum()
    # area 0.3x0.3 at 1/16 deg pixels → ~(0.3*16)^2 ≈ 23 px
    assert 15 <= tot <= 36
    assert set(out["n_zones"]) <= {0, 1}


def test_burn_attr_same_as_zone_id(spark):
    """burn_attr may name the zone-id column itself (burn the gid into
    the pixels) — regression: this used to build a duplicate-label
    select and crash in the per-tile kernel."""
    tiles = _tiles_df(spark)
    zones = spark.createDataFrame(pd.DataFrame({
        "gid": [3], "geometry_wkb": [wkb.box(0.1, 1.6, 0.4, 1.9)]}))
    out = burn_zones_to_tiles(tiles, zones, burn_attr="gid",
                              background=-1.0).toPandas()
    burned = set()
    for _, r in out.iterrows():
        a = codec.decode_raw_f32(r["bytes"], 16, 16)
        burned |= set(np.unique(a).tolist())
    assert 3.0 in burned and -1.0 in burned
