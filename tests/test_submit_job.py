"""End-to-end launch-path test (north rule: 'launched via spark-submit
--py-files on multi-executor clusters').

Packages the engine as a zip, runs tools/submit_job.py through a REAL
spark-submit on a 2-executor local-cluster (separate executor JVMs, not
local[N] threads), then re-submits to prove checkpoint resume skips the
completed stages. Slowest test in the suite (~2 JVM cold starts); kept
because it is the only coverage of the actual deployment surface.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_cluster_run_and_resume(tmp_path):
    zip_path = tmp_path / "gis_tools_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in (REPO / "gis_tools_spark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    ckpt, out = tmp_path / "ckpt", tmp_path / "out"
    cmd = [SPARK_SUBMIT, "--master", "local-cluster[2,2,1024]",
           "--py-files", str(zip_path), str(REPO / "tools" / "submit_job.py"),
           "--n-images", "2000", "--n-zones", "16",
           "--ckpt", str(ckpt), "--out", str(out)]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)

    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "pip hits:" in r1.stdout

    # outputs + lineage metrics landed
    assert (out / "images_per_zone").exists()
    assert (out / "zonal_stats").exists()
    assert (out / "lineage_metrics").exists()
    manifest = json.loads((ckpt / "r1" / "_manifest.json").read_text())
    stages = manifest["stages"]
    assert set(stages) == {"ingest", "tiling", "pip_join", "zonal"}
    assert stages["ingest"]["rows"] == 2000
    metrics_files_1 = sorted(p.name for p in (ckpt / "r1" / "_metrics").glob("*.json"))
    rec = json.loads((ckpt / "r1" / "_metrics" / metrics_files_1[0]).read_text())
    assert {"partition_id", "rows_in", "rows_out", "wall_ms"} <= set(rec)

    # resume: re-submit over the same checkpoint root → all stages skip
    # (no new lineage rows = nothing re-executed), outputs identical
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    metrics_files_2 = sorted(p.name for p in (ckpt / "r1" / "_metrics").glob("*.json"))
    assert metrics_files_2 == metrics_files_1

    tiles_line = [ln for ln in r1.stdout.splitlines() if ln.startswith("tiles:")]
    tiles_line_2 = [ln for ln in r2.stdout.splitlines() if ln.startswith("tiles:")]
    assert tiles_line == tiles_line_2 and tiles_line
