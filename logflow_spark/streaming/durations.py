"""Interval-string parsing shared by the streaming CEP operators.

Accepts singular and plural units ('1 hour', '30 minutes', '45 seconds') —
the pipeline CLI (cep_detect) passes user-typed strings straight through,
so a plural-only lookup would crash on '1 hour'.
"""

from __future__ import annotations

_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
}


def duration_us(spec: str) -> int:
    """'30 minutes' / '1 hour' / '45 seconds' → microseconds."""
    parts = spec.split()
    if len(parts) != 2:
        raise ValueError(f"expected '<n> <unit>', got {spec!r}")
    count, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNIT_US:
        raise ValueError(f"unit must be seconds|minutes|hours, got {spec!r}")
    return int(count) * _UNIT_US[unit]
