"""Relational / dataflow operators (SURVEY.md §2), batch + streaming shared.

Each builder returns a DataFrame plan — the same function is applied to a
batch DataFrame (oracle path) and a streaming DataFrame (production path), so
streaming-vs-batch equivalence is structural, not re-implemented.
"""
