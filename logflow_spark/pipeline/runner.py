"""CLI + DAG runner (reference: main.py:19-77, runner/cli_runner.py,
runner/dag_runner.py:8-39 — same arg shapes, same ready-set DAG semantics,
but the empty scheduler/airflow stubs of the reference are not replicated).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any

from logflow_spark.pipeline.registry import get_pipeline


def parse_kv_params(args: list[str]) -> dict[str, str]:
    """['k=v', ...] → dict (reference main.py:19-40 contract)."""
    params: dict[str, str] = {}
    for a in args:
        if "=" not in a:
            raise ValueError(f"pipeline params must be k=v, got {a!r}")
        k, v = a.split("=", 1)
        params[k] = v
    return params


def run_pipeline(name: str, params: dict[str, str]) -> Any:
    cls = get_pipeline(name)
    pipeline = cls.build(**params)
    return pipeline.run()


def run_dag(dag: dict[str, dict], max_workers: int = 4) -> dict[str, Any]:
    """Topological ready-set execution with per-step retries.

    dag: {step: {pipeline, params?, depends_on?, retries?}} — the YAML shape
    of the reference's config/yaml/dag_ingest.yaml.
    """
    results: dict[str, Any] = {}
    attempts: dict[str, int] = {s: 0 for s in dag}
    done: set[str] = set()
    failed: set[str] = set()

    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures: dict[cf.Future, str] = {}

        def submit_ready() -> None:
            for step, spec in dag.items():
                if step in done or step in failed:
                    continue
                if any(step == s for s in futures.values()):
                    continue
                deps = spec.get("depends_on", []) or []
                if all(d in done for d in deps):
                    fut = pool.submit(
                        run_pipeline, spec["pipeline"], spec.get("params", {}) or {}
                    )
                    futures[fut] = step

        submit_ready()
        while futures:
            finished, _ = cf.wait(futures, return_when=cf.FIRST_COMPLETED)
            for fut in finished:
                step = futures.pop(fut)
                try:
                    results[step] = fut.result()
                    done.add(step)
                except Exception as exc:  # retry up to `retries` times
                    attempts[step] += 1
                    retries = int(dag[step].get("retries", 0) or 0)
                    if attempts[step] <= retries:
                        nf = pool.submit(
                            run_pipeline,
                            dag[step]["pipeline"],
                            dag[step].get("params", {}) or {},
                        )
                        futures[nf] = step
                    else:
                        failed.add(step)
                        results[step] = exc
            submit_ready()

    if failed:
        raise RuntimeError(f"DAG steps failed permanently: {sorted(failed)}")
    stranded = set(dag) - done - failed
    if stranded:
        # a cycle or a depends_on naming a missing step means these could
        # never be scheduled — surface them instead of returning partial
        raise RuntimeError(
            f"DAG steps never became runnable (cycle or missing dependency): "
            f"{sorted(stranded)}"
        )
    return results
