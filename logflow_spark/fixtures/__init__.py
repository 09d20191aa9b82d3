"""Deterministic synthetic inputs (FIXTURES.md).

Every generator is a pure function of (row index, knobs) — no wall clock, no
unseeded randomness — so the distributed (Spark mapInPandas) and driver-side
(pandas) paths produce byte-identical tables, and oracles can recompute any
row independently.
"""

from logflow_spark.fixtures.pages import (  # noqa: F401
    ensure_pages_fixture,
    pages_pandas,
    pages_spark_df,
)
from logflow_spark.fixtures.enrichment import (  # noqa: F401
    enrichment_pandas,
    ensure_enrichment_fixture,
)
from logflow_spark.fixtures.log_events import log_events_pandas  # noqa: F401
