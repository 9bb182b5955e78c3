"""Packaging smoke test: the production deployment surface is
``spark-submit --py-files dist/replicheck_spark.zip jobs/dedup.py`` (SURVEY.md
§4.2 / BASELINE.json "packaged for spark-submit --py-files"). scripts/
package.sh builds the zip; this test executes the job FROM the zip end to end
so the packaging path cannot rot while `python jobs/dedup.py` (checkout
imports) stays green.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _spark_submit() -> str | None:
    return shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.exists("/opt/spark/bin/spark-submit")
        else None
    )


@pytest.mark.slow
def test_spark_submit_runs_job_from_zip(tmp_path):
    spark_submit = _spark_submit()
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    build = subprocess.run(
        ["bash", str(REPO / "scripts" / "package.sh")],
        capture_output=True, text=True,
    )
    assert build.returncode == 0, build.stderr
    zip_path = REPO / "dist" / "replicheck_spark.zip"
    assert zip_path.exists()

    # Copy the job OUTSIDE the checkout: jobs/dedup.py falls back to
    # sys.path-inserting its grandparent dir, which inside the repo would
    # shadow the zip with the checkout package. From tmp_path the package is
    # importable ONLY via --py-files — the actual deployment condition.
    job = tmp_path / "dedup_job.py"
    shutil.copy(REPO / "jobs" / "dedup.py", job)

    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[8]", "--driver-memory", "8g",
            "--py-files", str(zip_path), str(job),
            "--synth", "300", "--ckpt", str(tmp_path / "ckpt"),
            "--run-id", "zipsmoke",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    assert "Duplicate clusters:" in proc.stdout
    import re

    m = re.search(r"Processed (\d+) docs", proc.stdout)
    assert m and int(m.group(1)) > 0, proc.stdout[-2000:]
    # cluster output exists with a completed-stage marker
    assert (tmp_path / "ckpt" / "zipsmoke" / "clusters" / "_SUCCESS").exists()
