"""spark-submit entrypoint for the flagship pipeline (north rule:
'launched via spark-submit --py-files on multi-executor clusters').

Package the engine and run:

    cd /root/repo && zip -qr /tmp/gis_tools_spark.zip gis_tools_spark
    spark-submit --py-files /tmp/gis_tools_spark.zip tools/submit_job.py \
        --n-images 100000 --ckpt /tmp/ckpt --out /tmp/out

The pipeline is stage-checkpointed (resumable: re-submitting after a
failure skips completed stages) and writes per-partition lineage rows to
the metrics table under the checkpoint root.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=100_000)
    ap.add_argument("--n-zones", type=int, default=64)
    ap.add_argument("--ckpt", default="/tmp/gis_tools_spark_ckpt")
    ap.add_argument("--out", default="/tmp/gis_tools_spark_out")
    ap.add_argument("--run-id", default="r1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from gis_tools_spark import fixtures
    from gis_tools_spark.operators.sjoin import pip_join
    from gis_tools_spark.operators.split import image_tile_assignment
    from gis_tools_spark.plans import Pipeline
    from gis_tools_spark.raster.zonal import zonal_statistics

    # under spark-submit the session comes pre-configured by the launcher;
    # getOrCreate attaches to it (local fallback for direct runs)
    spark = (SparkSession.builder.appName("gis_tools_spark_job")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    pipe = Pipeline(spark, args.ckpt, run_id=args.run_id)

    images = pipe.stage(
        "ingest", lambda: fixtures.gen_images_spark(spark, args.n_images))
    zones_pd = fixtures.gen_zones(args.n_zones)
    zones = spark.createDataFrame(
        zones_pd[["gid", "nom", "secteur", "surf", "geometry_wkb"]])

    tiles = pipe.stage(
        "tiling",
        lambda: image_tile_assignment(
            images.select("image_id", "minx", "miny", "maxx", "maxy"), res=16),
        cell_col="cell")

    hits = pipe.stage(
        "pip_join",
        lambda: pip_join(images.select("image_id", "lon", "lat"), zones,
                         strategy="cell", salt_threshold=100_000))

    per_zone = hits.groupBy("gid", "nom").count()
    per_zone.write.mode("overwrite").parquet(f"{args.out}/images_per_zone")

    rasters = spark.createDataFrame(fixtures.gen_rasters(8, 8, 128))
    zs = pipe.stage("zonal", lambda: zonal_statistics(rasters, zones))
    zs.write.mode("overwrite").parquet(f"{args.out}/zonal_stats")

    m = pipe.metrics()
    m.write.mode("overwrite").parquet(f"{args.out}/lineage_metrics")
    print("stages:", {r["stage"]: r["n"] for r in
                      m.groupBy("stage").agg(F.sum("rows_out").alias("n")).collect()})
    print("tiles:", tiles.count(), "pip hits:", hits.count())
    spark.stop()


if __name__ == "__main__":
    main()
