"""BPE trainer semantics: the greedy left-to-right merge fold, the merge
trajectory's structural invariants, and the Spark-vs-reference-fold
differential on random symbol sequences (the DuckDB oracle proves the
corpus run; this pins the fold against a pure-Python referee on inputs
the corpus may never produce — a==b runs, pair-at-both-ends, etc.)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kalytical_spark.operators.bpe import _FOLD_MERGE, BPE_MERGES, _train


def _py_greedy_merge(syms: list[str], pa: str, pb: str) -> list[str]:
    """Textbook greedy left-to-right BPE merge application."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
            out.append(pa + pb)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _spark_fold(spark, syms: list[str], pa: str, pb: str) -> list[str]:
    df = spark.createDataFrame(
        [(syms, pa, pb)], "syms array<string>, pa string, pb string"
    )
    return df.select(F.expr(_FOLD_MERGE).alias("m")).collect()[0].m


CASES = [
    (["a", "a", "a"], "a", "a", ["aa", "a"]),
    (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
    (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
    (["a", "a", "b"], "a", "b", ["a", "ab"]),
    (["a", "b", "b"], "a", "b", ["ab", "b"]),
    (["x"], "a", "b", ["x"]),
    # merged symbol string-equal to an existing symbol must not re-merge
    (["ab", "b", "a", "b"], "a", "b", ["ab", "b", "ab"]),
]


@pytest.mark.parametrize("syms,pa,pb,want", CASES)
def test_fold_merge_pinned(spark, syms, pa, pb, want):
    assert _py_greedy_merge(syms, pa, pb) == want
    assert _spark_fold(spark, syms, pa, pb) == want


@settings(max_examples=25, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=10),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"])
    ),
)
def test_fold_merge_differential(spark, syms, pair):
    pa, pb = pair
    assert _spark_fold(spark, syms, pa, pb) == _py_greedy_merge(syms, pa, pb)


def test_bpe_trajectory_invariants(spark):
    from tests.conftest import SF_SMALL

    merges, state = _train(spark, SF_SMALL)
    rows = sorted(merges.collect(), key=lambda r: r.merge_rank)
    assert len(rows) == BPE_MERGES
    # token count strictly decreases while merges fire, and each round
    # removes at most pair_weight tokens (== pair_weight when left != right)
    prev = None
    for r in rows:
        if prev is not None:
            assert r.tokens_after < prev
        if r.left_sym != r.right_sym:
            shrink = (prev - r.tokens_after) if prev is not None else None
            if shrink is not None:
                assert shrink == r.pair_weight
        prev = r.tokens_after
    # final state: every learned merge symbol that survives is a
    # concatenation of the pair it was built from
    learned = {r.left_sym + r.right_sym for r in rows}
    syms = {
        s.symbol
        for s in state.select(F.explode("syms").alias("symbol")).distinct().collect()
    }
    assert learned & syms, "at least one learned symbol survives in the corpus"
