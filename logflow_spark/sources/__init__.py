"""Streaming sources (SURVEY.md §2.1)."""

from logflow_spark.sources.replay import pages_replay_stream, replay_stream  # noqa: F401
