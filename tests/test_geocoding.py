"""all_addresses composite: cascaded intersection + address concat."""

import pandas as pd
import pytest

from gis_tools_spark.geom import wkb
from gis_tools_spark.operators.geocoding import all_addresses


def test_all_addresses_rect_hierarchy(spark):
    regions = spark.createDataFrame(pd.DataFrame({
        "rid": [1, 2], "rname": ["North", "South"],
        "geometry_wkb": [wkb.box(0, 5, 10, 10), wkb.box(0, 0, 10, 5)]}))
    depts = spark.createDataFrame(pd.DataFrame({
        "did": [1, 2], "dname": ["West", "East"],
        "geometry_wkb": [wkb.box(0, 0, 5, 10), wkb.box(5, 0, 10, 10)]}))
    cities = spark.createDataFrame(pd.DataFrame({
        "cid": [1, 2, 3], "cname": ["A", "B", "C"],
        "geometry_wkb": [wkb.box(1, 6, 2, 7), wkb.box(6, 1, 7, 2),
                         wkb.box(4.5, 4.5, 5.5, 5.5)]}))
    out = all_addresses([regions, depts, cities],
                        name_cols=["rname", "dname", "cname"],
                        id_cols=["rid", "did", "cid"]).toPandas()
    assert len(out) == 6
    a = out[out.address.str.startswith("A")]
    assert len(a) == 1
    assert a["address"].iloc[0] == "A, West, North"
    assert a["area"].iloc[0] == pytest.approx(1.0)
    c = out[out.address.str.startswith("C")]
    assert len(c) == 4
    assert (abs(c["area"] - 0.25) < 1e-9).all()
