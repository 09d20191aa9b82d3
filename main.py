#!/usr/bin/env python
"""CLI entry point (reference parity: main.py pipeline/dag modes).

  python main.py pipeline <name> k=v [k=v ...]
  python main.py dag <workflow.yaml> [max_workers]
  python main.py list

Submit on a cluster with:  spark-submit --py-files logflow_spark.zip main.py ...
(package the library with `python -m zipfile -c logflow_spark.zip logflow_spark`).
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    mode = argv[1]

    from logflow_spark.pipeline.registry import PIPELINES
    from logflow_spark.pipeline.runner import parse_kv_params, run_dag, run_pipeline

    if mode == "list":
        for name, cls in sorted(PIPELINES.items()):
            print(f"{name}: {(cls.__doc__ or '').strip().splitlines()[0]}")
        return 0

    if mode == "pipeline":
        if len(argv) < 3:
            print("usage: main.py pipeline <name> k=v ...")
            return 2
        name, params = argv[2], parse_kv_params(argv[3:])
        result = run_pipeline(name, params)
        print(json.dumps({"pipeline": name, "result": result}, default=str))
        return 0

    if mode == "dag":
        if len(argv) < 3:
            print("usage: main.py dag <workflow.yaml> [max_workers]")
            return 2
        import yaml

        with open(argv[2]) as f:
            dag = yaml.safe_load(f)
        max_workers = int(argv[3]) if len(argv) > 3 else 4
        results = run_dag(dag, max_workers=max_workers)
        print(json.dumps({"dag": argv[2], "steps": list(results)}, default=str))
        return 0

    print(f"unknown mode {mode!r}; use pipeline | dag | list")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
