"""raster_crosstab (raster/ops.py) vs numpy reference."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.raster import codec
from gis_tools_spark.raster.ops import raster_crosstab


def _tiles(spark, arrays):
    rows = [(iid, codec.encode_raw_f32(a.astype(np.float32)),
             a.shape[1], a.shape[0], "raw_f32")
            for iid, a in arrays.items()]
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt"]))


def test_matches_numpy(spark):
    rng = np.random.RandomState(1)
    a_arrays, b_arrays = {}, {}
    for t in range(4):
        a = rng.randint(0, 6, (32, 32)).astype(np.float32)
        b = rng.randint(0, 4, (32, 32)).astype(np.float32)
        a[rng.rand(32, 32) < 0.05] = codec.NO_DATA_F32
        b[rng.rand(32, 32) < 0.05] = codec.NO_DATA_F32
        a_arrays[f"t{t}"], b_arrays[f"t{t}"] = a, b
    out = raster_crosstab(_tiles(spark, a_arrays), _tiles(spark, b_arrays))
    got = {(int(r["val_a"]), int(r["val_b"])): r["n_pixels"]
           for r in out.collect()}
    want = {}
    for t in a_arrays:
        a, b = a_arrays[t], b_arrays[t]
        ok = (a != codec.NO_DATA_F32) & (b != codec.NO_DATA_F32)
        for va, vb in zip(a[ok], b[ok]):
            want[(int(va), int(vb))] = want.get((int(va), int(vb)), 0) + 1
    assert got == want
    assert sum(got.values()) == sum(
        ((a_arrays[t] != codec.NO_DATA_F32)
         & (b_arrays[t] != codec.NO_DATA_F32)).sum() for t in a_arrays)


def test_identical_layers_diagonal(spark):
    a = {"x": np.arange(64, dtype=np.float32).reshape(8, 8) % 5}
    out = raster_crosstab(_tiles(spark, a), _tiles(spark, a)).collect()
    assert all(r["val_a"] == r["val_b"] for r in out)
    assert sum(r["n_pixels"] for r in out) == 64


def test_shape_mismatch_raises(spark):
    a = {"x": np.zeros((8, 8), np.float32)}
    b = {"x": np.zeros((4, 4), np.float32)}
    with pytest.raises(Exception, match="co-gridded"):
        raster_crosstab(_tiles(spark, a), _tiles(spark, b)).collect()


def test_missing_partner_tiles_dropped(spark):
    a = {"x": np.ones((8, 8), np.float32), "y": np.ones((8, 8), np.float32)}
    b = {"x": np.full((8, 8), 2.0, np.float32)}
    out = raster_crosstab(_tiles(spark, a), _tiles(spark, b)).collect()
    assert len(out) == 1
    assert (out[0]["val_a"], out[0]["val_b"], out[0]["n_pixels"]) == (1, 2, 64)
