"""Skew stress: PIP join with 99% of points in ONE hot cell.

Evidence for the explicit-salting design (operators/core.salt_fact_side
+ hot-cell histogram): a pathological city-skew distribution must not
concentrate on one task. Compares wall time and the max task's share of
rows for salted vs unsalted cell joins at 1M points.

Run exclusively (no concurrent Spark):  python tools/skew_stress.py [n_points]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from gis_tools_spark import fixtures, get_spark
    from gis_tools_spark.operators.sjoin import pip_join

    spark = get_spark(app_name="skew_stress", cpus=32)

    zones_pd = fixtures.gen_zones(64)

    # 99% of points in one sub-cell spot INSIDE zone 0 (grid-scan for an
    # interior point — fixture zones are concave), 1% uniform background
    from gis_tools_spark.geom import kernels as K, wkb as WKB

    g0 = WKB.decode(zones_pd["geometry_wkb"].iloc[0])
    mnx, mny, mxx, mxy = K.bounds(g0)
    gx, gy = np.meshgrid(np.linspace(mnx, mxx, 41)[1:-1],
                         np.linspace(mny, mxy, 41)[1:-1])
    inside = K.covers_xy(g0, gx.ravel(), gy.ravel())
    ci = int(np.nonzero(inside)[0][len(np.nonzero(inside)[0]) // 2])
    cx, cy = float(gx.ravel()[ci]), float(gy.ravel()[ci])

    rng = np.random.default_rng(7)
    n_hot = int(n * 0.99)
    hot_lon = cx + rng.uniform(-0.01, 0.01, n_hot)
    hot_lat = cy + rng.uniform(-0.01, 0.01, n_hot)
    bg_lon = rng.uniform(5.0, 10.0, n - n_hot)
    bg_lat = rng.uniform(40.0, 45.0, n - n_hot)
    pts_pd = pd.DataFrame({
        "pid": np.arange(n),
        "lon": np.concatenate([hot_lon, bg_lon]),
        "lat": np.concatenate([hot_lat, bg_lat]),
    })
    pts = spark.createDataFrame(pts_pd).repartition(64).persist()
    pts.count()

    zones = spark.createDataFrame(zones_pd[["gid", "nom", "geometry_wkb"]])

    # Model the 100 TB regime: at real scale the polygon cover side
    # exceeds the broadcast threshold and the cell equi-join is a
    # SHUFFLE join — the hot cell then lands in ONE reducer unless
    # salted. (With a broadcastable dim side the fact rows never
    # shuffle, the hot cell stays spread over the scan partitions, and
    # salting is pure overhead — measured 3x slower; that regime needs
    # no salt, which is why salt_threshold is opt-in.)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    results = {}
    for label, kw in [("unsalted", {}),
                      ("salted", {"salt_threshold": 50_000}),
                      ("salted-sampled", {"salt_threshold": 50_000,
                                          "salt_sample": 0.02})]:
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = pip_join(pts, zones, strategy="cell", **kw).count()
            walls.append(round(time.perf_counter() - t0, 2))
        results[label] = {"walls": walls, "best": min(walls), "rows": cnt}
        print(label, results[label], flush=True)

    print({
        "n_points": n,
        "hot_fraction": 0.99,
        "unsalted_best_s": results["unsalted"]["best"],
        "salted_best_s": results["salted"]["best"],
        "salted_sampled_best_s": results["salted-sampled"]["best"],
        "speedup": round(results["unsalted"]["best"]
                         / results["salted-sampled"]["best"], 2),
        "rows_equal": len({r["rows"] for r in results.values()}) == 1,
    })
    spark.stop()


if __name__ == "__main__":
    main()
