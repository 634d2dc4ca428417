"""Two-parallelism scaling harness (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; sandbox protocol per
BASELINE.md — run the identical image workload at local[8] and
local[32] on the same input and report throughput at both plus
efficiency (T8/T32)/4 ... i.e. (throughput32/throughput8)/4).

Each measurement runs in a FRESH subprocess (own JVM) so the two
parallelism levels don't share a session. Results appended to
BENCH/BASELINE.md.

Usage: python tools/scale_bench.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKLOAD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gis_tools_spark import fixtures, get_spark
from gis_tools_spark.operators.sjoin import pip_join
from gis_tools_spark.operators.split import image_tile_assignment
from gis_tools_spark.raster.kernels import decode_phash_udf

cpus = {cpus}
n = {n}
spark = get_spark(app_name=f"scale_bench_{{cpus}}", cpus=cpus)
images = fixtures.gen_images_spark(spark, n, with_pixels=True).persist()
images.count()  # materialize generation outside the timed window
zones_pd = fixtures.gen_zones(64)
zones = spark.createDataFrame(zones_pd[["gid","nom","secteur","surf","geometry_wkb"]])

t0 = time.perf_counter()
n_tiles = image_tile_assignment(images.select("image_id","minx","miny","maxx","maxy"), res=16).count()
n_pip = pip_join(images.select("image_id","lon","lat"), zones, strategy="cell", salt_threshold=50000).count()
n_dec = images.select((decode_phash_udf()("bytes","w","h","fmt") == F.col("phash")).alias("ok")).where("ok").count()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall": wall, "n_images": n,
                   "throughput": n / wall, "tiles": n_tiles, "pip": n_pip, "decoded": n_dec}}))
spark.stop()
"""


def run_once(cpus: int, n: int) -> dict:
    code = WORKLOAD.format(repo=str(REPO), cpus=cpus, n=n)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(REPO), timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output at cpus={cpus}:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SCALE_BENCH_IMAGES", "120000"))
    r8 = run_once(8, n)
    r32 = run_once(32, n)
    eff = (r32["throughput"] / r8["throughput"]) / 4.0
    report = {
        "n_images": n,
        "local8": {"wall_sec": round(r8["wall"], 2), "images_per_sec": round(r8["throughput"], 1)},
        "local32": {"wall_sec": round(r32["wall"], 2), "images_per_sec": round(r32["throughput"], 1)},
        "scaling_efficiency": round(eff, 3),
        "criterion": "≥ 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = bench_dir / "BASELINE.md"
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    entry = (
        f"\n## Scaling run {stamp}\n\n"
        f"Workload: tiling (res-16 cell assignment) + PIP join (64 zones, salted) + "
        f"decode+phash over {n} synthetic geotagged images (seed 42, 80% on 12 hotspots).\n\n"
        f"| parallelism | wall (s) | images/sec |\n|---|---|---|\n"
        f"| local[8] (N) | {report['local8']['wall_sec']} | {report['local8']['images_per_sec']} |\n"
        f"| local[32] (4N) | {report['local32']['wall_sec']} | {report['local32']['images_per_sec']} |\n\n"
        f"**Scaling efficiency (T32/T8)/4 = {report['scaling_efficiency']}** "
        f"(criterion ≥ 0.8 → {'PASS' if report['pass'] else 'FAIL'})\n"
    )
    if not md.exists():
        md.write_text(
            "# BENCH/BASELINE — measured throughput & scaling evidence\n\n"
            "Sandbox protocol (BASELINE.md root): no real cluster — the same job runs at\n"
            "two parallelism levels, local[8] (N) and local[32] (4N), on identical input;\n"
            "scaling efficiency = (throughput@32 / throughput@8) / 4.\n")
    with md.open("a") as f:
        f.write(entry)


if __name__ == "__main__":
    main()
