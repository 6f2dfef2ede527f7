"""Packaging evidence for the north rule's production invocation:
`spark-submit --py-files deepee_spark.zip tools/run_pipeline.py`.

The test builds the zip exactly as the run_pipeline docstring says,
copies ONLY the entry script into a scratch dir, strips the repo from
PYTHONPATH, and runs spark-submit from that scratch cwd — so every
`deepee_spark` import must resolve from the shipped zip, the way a
cluster executor/driver would see it. Asserts a full documents->triples
run completes with the expected triple count for the deterministic
300-doc synthetic corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    zpath = tmp_path / "deepee_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "deepee_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    script = tmp_path / "run_pipeline.py"
    shutil.copy(REPO / "tools" / "run_pipeline.py", script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", str(zpath),
            str(script),
            "--docs", "300",
            "--warehouse", str(tmp_path / "wh"),
            "--json",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    res = json.loads(lines[-1])
    assert res["docs"] == 300 and res["triples"] > 0
    assert res["ran"] and not res["skipped"]
    # resume through the SAME zip: a second submit skips every stage
    proc2 = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", str(zpath),
            str(script),
            "--docs", "300",
            "--warehouse", str(tmp_path / "wh"),
            "--resume", "--json",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    res2 = json.loads(
        [ln for ln in proc2.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res2["triples"] == res["triples"]
    assert not res2["ran"] and res2["skipped"]
