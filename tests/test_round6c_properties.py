"""Round-6 property pins (pure Python + DuckDB — no SparkSession):

- the truncating-division helper used by the Holt recursion is
  bit-identical to DuckDB's HUGEINT ``//`` on signed operands (the
  cross-engine contract the oracle's WITH RECURSIVE relies on);
- content-defined chunk bounds PARTITION the word sequence: the chunks
  reassemble to the exact normalized text for any input, and a shared
  suffix after a head insertion re-aligns to identical chunk hashes
  past the first post-insertion boundary (the CDC shift-proof
  property).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from marketing_attribution_etl_framework__maef_spark.operators.timeseries import _tdiv

from tests.test_round6c_ops import _cdc_expected


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=-(10**30), max_value=10**30),
    d=st.integers(min_value=1, max_value=10**12),
)
def test_tdiv_matches_duckdb_hugeint_division(a, d):
    got = duckdb.sql(
        f"SELECT CAST({a} AS HUGEINT) // CAST({d} AS HUGEINT)"
    ).fetchone()[0]
    assert _tdiv(a, d) == int(got)


_words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=60
)


@settings(max_examples=100, deadline=None)
@given(ws=_words)
def test_cdc_bounds_partition_the_text(ws):
    import hashlib

    text = " ".join(ws)
    # replica of the bounds device (kept in lockstep with _cdc_expected)
    n = len(ws)
    cuts = []
    for i0 in range(max(n - 2, 1)):
        h = int(hashlib.md5(" ".join(ws[i0 : i0 + 3]).encode()).hexdigest()[:15], 16)
        if h % 8 == 0 and i0 + 3 < n:
            cuts.append(i0 + 3)
    bounds = [0] + cuts + [n]
    # strictly increasing bounds covering [0, n] -> chunks partition ws
    assert bounds == sorted(set(bounds))
    chunks = [" ".join(ws[bounds[j - 1] : bounds[j]]) for j in range(1, len(bounds))]
    assert " ".join(chunks) == text
    assert len(_cdc_expected(text)) == len(chunks)


@settings(max_examples=50, deadline=None)
@given(ws=st.lists(st.text(alphabet="xyz", min_size=1, max_size=3), min_size=12, max_size=40))
def test_cdc_shared_tail_realigns_after_insertion(ws):
    t1 = " ".join(ws)
    t2 = " ".join(["inserted"] + ws)
    c1, c2 = _cdc_expected(t1), _cdc_expected(t2)
    # if the original text has an interior cut, every chunk of t1 from
    # the first cut onward also appears in t2's chunk list (boundaries
    # are functions of local content; the insertion shifts nothing
    # downstream of the first shared boundary)
    if len(c1) > 1:
        assert set(c1[1:]) <= set(c2)
