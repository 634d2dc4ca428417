"""WKT codec (geom/wkt.py)."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.geom import wkb as B
from gis_tools_spark.geom import wkt as T

CASES = [
    "POINT (1 2)",
    "POINT (1 2 3)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1.5 2.25, -3 400)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
    "((5 5, 6 5, 6 6, 5 5), (5.2 5.2, 5.4 5.2, 5.4 5.4, 5.2 5.2)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("text", CASES)
def test_idempotent_roundtrip(text):
    g = T.decode(text)
    t2 = T.encode(g)
    assert T.encode(T.decode(t2)) == t2


def test_alt_spellings_and_ws():
    assert T.encode(T.decode("MULTIPOINT (1 2, 3 4)")) == \
        "MULTIPOINT ((1 2), (3 4))"
    assert T.encode(T.decode("  point\t( 1   2 )  ")) == "POINT (1 2)"
    assert T.encode(T.decode("POINT Z (1 2 3)")) == "POINT (1 2 3)"


def test_precision_bit_exact():
    vals = np.random.RandomState(0).uniform(-180, 180, 40)
    text = "LINESTRING (" + ", ".join(
        f"{repr(float(a))} {repr(float(b))}"
        for a, b in zip(vals[::2], vals[1::2])) + ")"
    g = T.decode(text)
    g2 = T.decode(T.encode(g))
    assert np.array_equal(np.asarray(g["coords"]),
                          np.asarray(g2["coords"]))


def test_wkb_cross_roundtrip():
    for text in CASES:
        if ("EMPTY" in text or "(1 2 3)" in text
                or "GEOMETRYCOLLECTION" in text):
            continue     # wkb writer has no collection support
        g = T.decode(text)
        g2 = B.decode(B.encode(g))
        assert T.encode(g2) == T.encode(g)


def test_errors():
    for bad in ("CIRCLE (0 0, 1)", "POINT (1", "POLYGON 1 2",
                "POINT (1 2) junk", ""):
        with pytest.raises(ValueError):
            T.decode(bad)


def test_spark_sql_surface(spark):
    from pyspark.sql import functions as F

    from gis_tools_spark.functions.geom_funcs import (geom_area,
                                                      geom_as_text,
                                                      geom_from_text)
    from gis_tools_spark.functions.sql_api import register_sql_functions

    names = register_sql_functions(spark)
    assert "st_astext" in names and "st_geomfromtext" in names
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    buf = B.encode({"type": "Polygon", "rings": [ring]})
    df = spark.createDataFrame(pd.DataFrame({"geometry_wkb": [buf]}))
    df.createOrReplaceTempView("wkt_t")
    row = spark.sql(
        "SELECT st_area(st_geomfromtext(st_astext(geometry_wkb))) AS a, "
        "st_astext(geometry_wkb) AS t FROM wkt_t").head()
    assert abs(row["a"] - 4.0) < 1e-12
    assert row["t"] == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    # dirty-input contract
    bad = spark.createDataFrame(pd.DataFrame({"t": ["nope ((", None]}))
    out = bad.select(geom_from_text()(F.col("t")).alias("b")).collect()
    assert out[0]["b"] is None and out[1]["b"] is None
