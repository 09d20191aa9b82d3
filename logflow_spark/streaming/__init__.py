"""Structured-Streaming topology: source → parse → enrich → window → sink."""
