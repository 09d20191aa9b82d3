"""Property-based tests (hypothesis): the vectorized extraction equals the
pure-Python oracle on arbitrary html-shaped inputs, not just fixture shapes."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from logflow_spark.functions.text import (
    _extract_text_series,
    extract_text_py,
    host_py,
)

# text content that cannot open/close tags (keeps the grammar unambiguous,
# as in real extracted inner text)
inner = st.text(
    alphabet=st.characters(blacklist_characters="<>", blacklist_categories=("Cs",)),
    max_size=40,
)


@st.composite
def html_doc(draw):
    title = draw(st.one_of(st.none(), inner))
    paras = draw(st.lists(inner, max_size=5))
    head = f"<head><title>{title}</title></head>" if title is not None else "<head></head>"
    body = "".join(f"<p>{p}</p>" for p in paras)
    return f"<html>{head}<body>{body}</body></html>".encode("utf-8")


@given(st.lists(st.one_of(st.none(), html_doc()), min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_vectorized_extraction_equals_oracle(docs):
    got = _extract_text_series(pd.Series(docs, dtype="object"))
    for g, d in zip(got, docs):
        exp = extract_text_py(d)
        if exp is None:
            assert g is None or pd.isna(g)
        else:
            assert g == exp


@given(
    st.one_of(
        st.none(),
        st.from_regex(r"https?://[a-z0-9.-]{1,20}(/[a-z0-9/._-]{0,20})?", fullmatch=True),
        st.text(max_size=30),
    )
)
@settings(max_examples=200, deadline=None)
def test_host_py_total(url):
    """host_py never raises and returns '' / None / a substring of the url."""
    h = host_py(url)
    if url is None:
        assert h is None
    else:
        assert h == "" or h in url
