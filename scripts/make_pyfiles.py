#!/usr/bin/env python
"""Package logflow_spark for spark-submit --py-files (north_rule submission
path: `spark-submit --py-files dist/logflow_spark.zip scripts/submit_topology.py`).

Pure stdlib; writes dist/logflow_spark.zip containing the package tree
(sources only — the zip is importable on every executor's PYTHONPATH).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "logflow_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "logflow_spark")
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, names in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                p = os.path.join(root, name)
                z.write(p, os.path.relpath(p, REPO))
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
