"""Boundary-respecting sequence packing (operators/packing.py): packs
never exceed capacity (feasible by construction — no slot rounding),
every document lands in exactly one pack, conservation holds across the
eject rounds, and the efficiency rollup's lower bound is honored."""

from __future__ import annotations

from collections import defaultdict

from kalytical_spark.operators import packing
from tests.conftest import SF_ORACLE


def test_packs_respect_capacity_and_partition(spark):
    rows = packing.docs_pack_assignments(spark, SF_ORACLE).collect()
    assert rows
    per_pack_tokens = defaultdict(int)
    seen_docs = set()
    for r in rows:
        assert r.doc_id not in seen_docs  # exactly one pack per doc
        seen_docs.add(r.doc_id)
        assert r.packed_tok == min(r.n_tok, packing.PACK_CAP)
        assert r.truncated == (r.n_tok > packing.PACK_CAP)
        per_pack_tokens[r.pack_id] += r.packed_tok
    # capacity feasibility: ACTUAL token load, not slot budgets
    assert all(v <= packing.PACK_CAP for v in per_pack_tokens.values())
    # conservation: the eject rounds drop nothing — every corpus doc with
    # at least one token is assigned (n_tok >= 1 always: split('') == [''])
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert len(seen_docs) == docs.count()
    # a full-capacity or solo pack holds exactly one document
    by_kind = defaultdict(list)
    for r in rows:
        by_kind[r.pack_id.split("|")[1]].append(r)
    for kind in ("full", "solo"):
        packs = defaultdict(int)
        for r in by_kind.get(kind, []):
            packs[r.pack_id] += 1
        assert all(c == 1 for c in packs.values())


def test_exactly_full_tail_pack_is_kept(spark):
    """A group's final pack ejects to the next round only when PARTIAL:
    an exactly-full final pack (group tokens a multiple of PACK_CAP) has
    zero waste and must not churn through later rounds."""
    from pyspark.sql import Row

    quarter = packing.PACK_CAP // 4
    rows = [
        Row(doc_id=i, source="s", n_tok=quarter, packed_tok=quarter, truncated=False)
        for i in range(8)  # exactly two full packs
    ]
    kept, ejected = packing._round_assign(spark.createDataFrame(rows), 1, 1, True)
    assert ejected.count() == 0
    packs = kept.groupBy("pack_id").count().collect()
    assert sorted(p["count"] for p in packs) == [4, 4]

    # a partial final pack still ejects
    rows_partial = rows + [
        Row(doc_id=9, source="s", n_tok=10, packed_tok=10, truncated=False)
    ]
    kept2, ejected2 = packing._round_assign(
        spark.createDataFrame(rows_partial), 1, 1, True
    )
    assert kept2.count() + ejected2.count() == 9
    assert ejected2.count() >= 1  # the 10-token tail


def test_efficiency_rollup_bounds(spark):
    rows = packing.docs_packing_efficiency(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.n_packs >= r.lower_bound_packs
        assert r.padding_tokens == r.n_packs * packing.PACK_CAP - r.packed_tokens
        assert 0 < r.fill_milli <= 1000
        assert r.overhead_milli >= 0
        # the multi-round prefix packer's waste is one straddle hole per
        # pack plus merged tails — fill sits far above this sanity floor
        # (measured 847 milli weighted at sf0.1, 598->179 overhead_milli
        # vs the r9 bucketed scheme)
        assert r.fill_milli > 500, r


def test_null_text_docs_are_conserved(spark):
    """NULL text must coalesce to 0 tokens, not silently vanish: a NULL
    n_tok fails both routing filters (== CAP and < CAP), dropping the doc
    from every pack in BOTH engines — the oracle gate agrees and the
    clean-fixture conservation test never sees it (ADVICE r10)."""
    import os
    import tempfile

    from pyspark.sql import Row

    rows = [Row(doc_id=1, source="s", text=None)] + [
        Row(doc_id=i, source="s", text="a b c") for i in range(2, 12)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        # a full sf-dir view (catalog.register wants every table), with
        # only the documents table swapped for the dirty fixture
        for name in os.listdir(SF_ORACLE):
            if name != "documents.parquet":
                os.symlink(
                    os.path.join(SF_ORACLE, name), os.path.join(tmp, name)
                )
        spark.createDataFrame(rows).write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = packing.docs_pack_assignments(spark, tmp).collect()
        assert {r.doc_id for r in got} == {r.doc_id for r in rows}
        null_doc = [r for r in got if r.doc_id == 1][0]
        assert null_doc.n_tok == 0 and null_doc.packed_tok == 0
        assert null_doc.truncated is False
