"""spark-submit --py-files packaging (SURVEY §7.2 item 9 / north_rule
submission shape): the zip must be importable standalone, and the submit
entry must drain the flagship topology end-to-end under spark-submit.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

from tests.conftest import CACHE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_importable(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    out = build(str(tmp_path / "logflow_spark.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "logflow_spark/streaming/topology.py" in names
    assert not any("__pycache__" in n for n in names)
    # importable from the zip alone (fresh interpreter, repo not on path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import logflow_spark.operators.dedup as d; print(d.N_BANDS)"
    )
    p = subprocess.run(
        [sys.executable, "-c", code, out],
        capture_output=True,
        text=True,
        cwd="/",
        timeout=60,
    )
    assert p.returncode == 0, p.stderr
    assert p.stdout.strip() == "8"


def test_spark_submit_drains_topology(pages_dir):
    """Real spark-submit --py-files run of the flagship topology (local
    master stands in for the cluster; the submission shape is identical)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build()
    table = os.path.join(CACHE, "submit_table")
    shutil.rmtree(table, ignore_errors=True)
    p = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_topology.py"),
            "--input",
            pages_dir,
            "--table",
            table,
            "--watermark",
            "73 hours",
            "--extract",
            "jvm",
            "--drain",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/",  # NOT the repo — the package must come from --py-files
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert p.returncode == 0, p.stderr[-2000:]
    import json

    metrics = json.loads(p.stdout.strip().splitlines()[-1])
    assert metrics["total_rows"] > 0
