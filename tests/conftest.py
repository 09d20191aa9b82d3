from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logflow_spark.session import get_spark  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="logflow_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def pages_dir():
    from logflow_spark.fixtures.pages import ensure_pages_fixture

    return ensure_pages_fixture(
        os.path.join(CACHE, "pages_test_n4000_c8f"), n_rows=4000, n_chunks=8, flush_row=True
    )


@pytest.fixture(scope="session")
def pages_late_dir():
    from logflow_spark.fixtures.pages import ensure_pages_fixture

    return ensure_pages_fixture(
        os.path.join(CACHE, "pages_test_late_n4000_c8f"),
        n_rows=4000,
        n_chunks=8,
        late_every=97,
        late_by_s=2700,
        flush_row=True,
    )


@pytest.fixture(scope="session")
def enrichment_dir():
    from logflow_spark.fixtures.enrichment import ensure_enrichment_fixture

    return ensure_enrichment_fixture(
        os.path.join(CACHE, "enrich_test_h200"), n_hosts=200, n_chunks=4
    )
