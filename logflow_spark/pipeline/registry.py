"""Name → pipeline-class registry (reference: pipeline/registry.py:6-13)."""

from __future__ import annotations

from typing import Callable, Type

PIPELINES: dict[str, type] = {}


def register(name: str) -> Callable[[Type], Type]:
    def deco(cls: Type) -> Type:
        PIPELINES[name] = cls
        return cls

    return deco


def get_pipeline(name: str) -> type:
    try:
        return PIPELINES[name]
    except KeyError:
        raise KeyError(
            f"unknown pipeline '{name}'; available: {sorted(PIPELINES)}"
        ) from None


# importing the module registers the built-in pipelines
from logflow_spark.pipeline import builtin  # noqa: E402,F401
