"""Boundary-respecting sequence packing (operators/packing.py): packs
never exceed capacity, every document lands in exactly one pack, the
bucketed approximation's fill is within its provable bound, and the
efficiency rollup's lower bound is honored."""

from __future__ import annotations

from collections import defaultdict

from kalytical_spark.operators import packing
from tests.conftest import SF_ORACLE


def test_packs_respect_capacity_and_partition(spark):
    rows = packing.docs_pack_assignments(spark, SF_ORACLE).collect()
    assert rows
    per_pack_tokens = defaultdict(int)
    per_pack_bucket = {}
    seen_docs = set()
    for r in rows:
        assert r.doc_id not in seen_docs  # exactly one pack per doc
        seen_docs.add(r.doc_id)
        assert r.packed_tok == min(r.n_tok, packing.PACK_CAP)
        assert r.truncated == (r.n_tok > packing.PACK_CAP)
        # bucket is the smallest power of two >= capped length
        assert r.len_bucket >= r.packed_tok
        assert r.len_bucket // 2 < r.packed_tok or r.len_bucket == 1
        per_pack_tokens[r.pack_id] += r.packed_tok
        # a pack never mixes buckets (the budget argument depends on it)
        assert per_pack_bucket.setdefault(r.pack_id, r.len_bucket) == r.len_bucket
    assert all(v <= packing.PACK_CAP for v in per_pack_tokens.values())


def test_efficiency_rollup_bounds(spark):
    rows = packing.docs_packing_efficiency(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.n_packs >= r.lower_bound_packs
        assert r.padding_tokens == r.n_packs * packing.PACK_CAP - r.packed_tokens
        assert 0 < r.fill_milli <= 1000
        assert r.overhead_milli >= 0
        # power-of-2 bucketing wastes < half a slot per doc plus pack
        # tails, so fill can't collapse: each pack's slots are >= half
        # full of real tokens except possibly the last pack per
        # (source, bucket, shard) group — sanity floor far below that
        assert r.fill_milli > 200, r
