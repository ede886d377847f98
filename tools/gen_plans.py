"""Generate PLANS.md: formatted physical plans for the headline queries with
the scale-relevant properties called out. Run: python tools/gen_plans.py"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.operators import dag, dedup, relational, similarity  # noqa: E402
from kalytical_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

SHOWCASE = [
    (
        "dag_fire_decisions (flagship)",
        lambda s: dag.dag_fire_decisions(s, SF),
        "Event side never shuffles before the final aggregate: both the edge\n"
        "explode-join and the defs metadata join are BroadcastHashJoin. The\n"
        "only exchanges belong to the two-phase countDistinct aggregate plus\n"
        "the O(pipelines) n_deps rollup on the broadcast build side.",
    ),
    (
        "q1_pricing_summary",
        lambda s: relational.q1_pricing_summary(s, SF),
        "Single hash aggregate with map-side partials, whole-stage codegen\n"
        "end to end; the shipdate filter reaches the parquet scan.",
    ),
    (
        "q3_shipping_priority",
        lambda s: relational.q3_shipping_priority(s, SF),
        "Fact-to-dim joins broadcast; the top-10 is TakeOrderedAndProject\n"
        "(bounded per-partition heaps, no global sort).",
    ),
    (
        "sim_topk_bruteforce",
        lambda s: similarity.sim_topk_bruteforce(s, SF),
        "Query vectors broadcast against the corpus scan; similarity math is\n"
        "JVM-side higher-order functions; one shuffle for the per-query\n"
        "top-k window.",
    ),
    (
        "dedup_minhash_lsh",
        lambda s: dedup.dedup_minhash_lsh(s, SF),
        "Signatures are one groupBy with 16 min-aggregates over hash slices\n"
        "projected from just 4 md5 calls per shingle (materialized once; the\n"
        "band self-join reuses the cache); verification touches only\n"
        "band-bucket candidate pairs, with the shingle table semi-join\n"
        "pruned to candidate docs before the intersection shuffle.",
    ),
    (
        "pipeline_curate_corpus",
        lambda s: _curation().pipeline_curate_corpus(s, SF),
        "The flagship curation pipeline's near-dup stage consumes MinHash-LSH\n"
        "band candidates (verified exactly) — the exhaustive shared-shingle\n"
        "self-join never appears; quality/exact stages are one window pass.",
    ),
    (
        "text_tfidf_topk",
        lambda s: _ranking().text_tfidf_topk(s, SF),
        "Join policy by cardinality class: the vocabulary-sized df table\n"
        "rides a ShuffledHashJoin on term (a forced broadcast would blow\n"
        "the driver exactly when the corpus grows; AQE skew-split handles\n"
        "stopword-hot probe partitions), while the 1-row corpus scalar\n"
        "stays a BroadcastNestedLoopJoin. Fully JVM-side; guarded by\n"
        "test_plans.py.",
    ),
    (
        "sim_topk_sq8",
        lambda s: similarity.sim_topk_sq8(s, SF),
        "SQ8 flat scan: the global quantization scale is a broadcast scalar,\n"
        "the integer code dot/norms are zip_with/aggregate folds in codegen\n"
        "(no Python), and ranking shuffles once for the per-query window.",
    ),
    (
        "pii_scrub_docs",
        lambda s: _scrub().pii_scrub_docs(s, SF),
        "PII redaction is a zero-shuffle map pass: regexp_count/replace in\n"
        "whole-stage codegen directly over the scan — the 100 TB shape\n"
        "(the plan has no Exchange at all).",
    ),
    (
        "dag_critical_path",
        lambda s: _graph().dag_critical_path(s, SF),
        "Bounded weighted longest path: every DP level joins the broadcast\n"
        "edge list and broadcast weight table — the path frontier is never\n"
        "shuffled; the cached DP result feeds the max and argmax consumers\n"
        "once.",
    ),
    (
        "orders_incremental_agg",
        lambda s: _incremental().orders_incremental_agg(s, SF),
        "Incremental view maintenance: the snapshot diff is one keyed\n"
        "full-outer sort-merge join; signed deltas aggregate only the\n"
        "touched keys and merge into the old aggregate with one small\n"
        "outer join — the unchanged bulk is never re-aggregated.",
    ),
    (
        "emb_label_coherence",
        lambda s: _embedding_stats().emb_label_coherence(s, SF),
        "Gram-identity coherence: two linear hash aggregates over the\n"
        "exploded components replace the O(N^2) vector self-join; the only\n"
        "join in the plan is the |labels|-row rollup merge.",
    ),
    (
        "docs_quality_classifier",
        lambda s: _filtering().docs_quality_classifier(s, SF),
        "Model-based filtering as a pure projection: the integer-logit\n"
        "scorer runs in whole-stage codegen directly over the scan — no\n"
        "Exchange, no Python nodes (enforced in tests/test_filtering.py).",
    ),
    (
        "events_balanced_sample",
        lambda s: _sampling().events_balanced_sample(s, SF),
        "Deterministic stratified sampling: the per-stratum threshold dim\n"
        "broadcasts onto the scan, so selection is partition-local; the\n"
        "only exchanges belong to the tiny count and audit aggregates.",
    ),
    (
        "pipeline_training_mix",
        lambda s: _mix().pipeline_training_mix(s, SF),
        "The composed training-mix build: curation's LSH near-dup stage,\n"
        "the codegen classifier projection, and broadcast quota/split\n"
        "thresholds appear as the union of the stage plans — composition\n"
        "adds no new shuffle shape.",
    ),
    (
        "q9_product_type_profit",
        lambda s: _warehouse().q9_product_type_profit(s, SF),
        "Star join with every dim broadcast: the lineitem fact is read\n"
        "once and shuffles exactly once, for the (nation, year) two-phase\n"
        "aggregate (plan-asserted in tests/test_plans.py).",
    ),
    (
        "q19_disjunctive_revenue",
        lambda s: _warehouse().q19_disjunctive_revenue(s, SF),
        "The OR-of-ANDs profile stays ONE broadcast join: Catalyst derives\n"
        "per-side OR-decompositions and pushes them into BOTH parquet\n"
        "scans (PushedFilters show the Or(...) trees) — no union of\n"
        "per-branch scans.",
    ),
    (
        "range_join_events_during_jobs",
        lambda s: _rangejoin().events_during_jobs(s, SF),
        "Interval containment with no equi-key, made an equi-join: job\n"
        "windows explode into the 1-2 hour-buckets they span, events map\n"
        "to one bucket, and the join hashes on the bucket — no\n"
        "BroadcastNestedLoopJoin anywhere (plan-asserted).",
    ),
    (
        "sketch_hll_registers",
        lambda s: _sketches().sketch_hll_registers(s, SF),
        "HLL sketching as one two-phase hash aggregate: the md5 nibble\n"
        "arithmetic runs in whole-stage codegen over the scan, partial MAX\n"
        "registers combine map-side, and the only exchange carries 64\n"
        "small ints per group — raw user keys never shuffle.",
    ),
    (
        "graph_copurchase_triangles",
        lambda s: _sketches().graph_copurchase_triangles(s, SF),
        "Triangle census: per-order pair expansion is a JVM higher-order\n"
        "array transform (one shuffle to group the order, one for edge\n"
        "support), and the wedge join runs on the degree-ordered edge\n"
        "list — hub-node fan-out is bounded by the orientation, and the\n"
        "checkpointed edge list is read by all three join legs without\n"
        "re-mining.",
    ),
    (
        "mm_audio_window_energy",
        lambda s: _audio().mm_audio_window_energy(s, SF),
        "Audio windowing is a pure Arrow map: one mapInPandas node over\n"
        "the scan fans each asset into its windows with vectorized numpy\n"
        "— no Exchange in the plan at all; the per-window rows go straight\n"
        "to the sink (the 100 TB shape for feature extraction).",
    ),
    (
        "events_bitmap_retention",
        lambda s: _bitmaps().events_bitmap_retention(s, SF),
        "Retention without a log self-join: the event scan reduces once to\n"
        "per-day bit_or presence words (map-side combinable), and the\n"
        "day-over-day intersection joins only the word registers — the\n"
        "popcount AND runs over rows 63x smaller than the user set.",
    ),
    (
        "events_bloom_pruned_join",
        lambda s: _bloomjoin().events_bloom_pruned_join(s, SF),
        "Runtime-filter pruning made explicit: the dim side folds to\n"
        "<= 16 Bloom words that broadcast onto the fact scan; three\n"
        "bit-test filters drop non-joining rows inside the scan stage\n"
        "before the exact join sees them — result proven identical to\n"
        "the plain join by the oracle.",
    ),
    (
        "dedup_incremental_delta",
        lambda s: _dedup_incremental().dedup_incremental_delta(s, SF),
        "Per-ingest dedup shape: the band join probes the delta shard\n"
        "(pruned scan side) against the full band table — delta x all,\n"
        "never all x all — and verification semi-prunes the shingle table\n"
        "to candidate docs before the intersection shuffle.",
    ),
    (
        "sketch_cms_heavy_hitters",
        lambda s: _sketches().sketch_cms_heavy_hitters(s, SF),
        "Count-min build: per-user pre-aggregation (map-side combinable)\n"
        "before the D-way explode, so depth rows multiply distinct users,\n"
        "not raw events; the counter table is a constant D x W mergeable\n"
        "state and the top-k probe joins against it broadcast.",
    ),
    (
        "sketch_quantile_decades",
        lambda s: _quantiles().sketch_quantile_decades(s, SF),
        "Quantile sketch: one map-side-combinable groupBy into a fixed\n"
        "<=170-bin grid; the readout windows run over the bin table, and\n"
        "even the exact-rank anchor uses a two-level prefix sum\n"
        "partitioned by digit-count — no unpartitioned Window anywhere.",
    ),
    (
        "sketch_cms_join_size",
        lambda s: _sketches().sketch_cms_join_size(s, SF),
        "Join-size estimation from sketches alone: two D x W counter\n"
        "tables inner-product on (d, bucket) — the relations never meet;\n"
        "the exact join rides per-user count frames (one key shuffle) as\n"
        "the correctness anchor.",
    ),
    (
        "text_phrase_search",
        lambda s: _ranking().text_phrase_search(s, SF),
        "Phrase search without a positional self-join: token adjacency is\n"
        "a partition-local arrays_zip explode, the phrase-frequency table\n"
        "is vocabulary-sized, and the probe phrase is ONE broadcast row —\n"
        "the only corpus-keyed shuffle is the final per-doc count.",
    ),
    (
        "events_cusum_changepoints",
        lambda s: _timeseries().events_cusum_changepoints(s, SF),
        "CUSUM changepoints: the log reduces to a daily rollup (map-side\n"
        "combinable) and every window partitions by event_type over\n"
        "series-length rows; the n-scaled integer statistic keeps the\n"
        "cross-engine comparison bit-exact.",
    ),
    (
        "mm_audio_wav_roundtrip",
        lambda s: _audio().mm_audio_wav_roundtrip(s, SF),
        "The real-codec path: one Arrow map node encodes each payload\n"
        "into an actual RIFF/WAVE container and chunk-walks it back — no\n"
        "Exchange at all; the exact 8/16-bit round-trip is what lets a\n"
        "REAL format parser stay value-oracle-proven.",
    ),
    (
        "orders_market_basket",
        lambda s: _basket().orders_market_basket(s, SF),
        "Association rules from ONE shuffle on the basket key: the\n"
        "C(n,2) pair expansion is a JVM-side array transform over the\n"
        "pinned basket frame (fan-out bounded by basket size, never an\n"
        "all-pairs join on parts); item supports ride shuffle_hash joins\n"
        "(catalog-sized dim, never broadcast) and the rule ranking is a\n"
        "TakeOrderedAndProject.",
    ),
    (
        "users_rfm_segments",
        lambda s: _segments().users_rfm_segments(s, SF),
        "Three NTILE quintiles with NO unpartitioned window: each global\n"
        "rank decomposes as row_number within the metric's digit-length\n"
        "class plus broadcast per-class offsets, and the bucket is the\n"
        "closed-form NTILE formula over a one-row broadcast count — the\n"
        "oracle's plain ntile() proves the decomposition exact.",
    ),
    (
        "graph_label_propagation",
        lambda s: _graph().graph_label_propagation(s, SF),
        "Synchronous LPA: per round one co-partitioned labels->edges join\n"
        "and two hash aggregates (mode argmax on a composite bigint key);\n"
        "lineage is checkpoint-truncated per round, and the DuckDB twin\n"
        "unrolls the identical recurrence as MATERIALIZED CTEs.",
    ),
    (
        "text_maxscore_topk",
        lambda s: _maxscore().text_maxscore_topk(s, SF),
        "Max-score pruned retrieval: the query-term dim, the per-term\n"
        "upper bounds, the theta thresholds and the essential split are\n"
        "all <=16-row broadcasts; the only corpus-scale work is the\n"
        "posting scan and the (qid, doc) aggregation over ESSENTIAL\n"
        "postings' docs — the windows run over <=MAXSCORE_BUCKETS rows\n"
        "per query, never a posting list. The exhaustive-scorer oracle\n"
        "proves the prune lossless.",
    ),
    (
        "sim_maxsim_ivf_pruned",
        lambda s: _colbert().sim_maxsim_ivf_pruned(s, SF),
        "PLAID-shaped late interaction: per-token probe (one Arrow map\n"
        "over the broadcast centroid matrix) -> posting join -> DISTINCT\n"
        "candidates -> flat-codegen MaxSim re-rank. Constant cell size\n"
        "keeps per-query candidates ~constant as the corpus grows\n"
        "(SCALE_SWEEP emb chain: probe wall flat 12-15 s from 10x to\n"
        "100x); recall vs the exact scorer is oracle-floor-gated.",
    ),
]


def _curation():
    from kalytical_spark.operators import curation

    return curation


def _quantiles():
    from kalytical_spark.operators import quantiles

    return quantiles


def _timeseries():
    from kalytical_spark.operators import timeseries

    return timeseries


def _ranking():
    from kalytical_spark.operators import ranking

    return ranking


def _scrub():
    from kalytical_spark.operators import scrub

    return scrub


def _graph():
    from kalytical_spark.operators import graph

    return graph


def _incremental():
    from kalytical_spark.operators import incremental

    return incremental


def _embedding_stats():
    from kalytical_spark.operators import embedding_stats

    return embedding_stats


def _filtering():
    from kalytical_spark.operators import filtering

    return filtering


def _sampling():
    from kalytical_spark.operators import sampling

    return sampling


def _mix():
    from kalytical_spark.operators import mix

    return mix


def _warehouse():
    from kalytical_spark.operators import warehouse

    return warehouse


def _rangejoin():
    from kalytical_spark.operators import rangejoin

    return rangejoin


def _sketches():
    from kalytical_spark.operators import sketches

    return sketches


def _audio():
    from kalytical_spark.operators import audio

    return audio


def _bitmaps():
    from kalytical_spark.operators import bitmaps

    return bitmaps


def _bloomjoin():
    from kalytical_spark.operators import bloomjoin

    return bloomjoin


def _dedup_incremental():
    from kalytical_spark.operators import dedup_incremental

    return dedup_incremental


def main() -> None:
    spark = get_spark("gen_plans", cpus=8)
    catalog.register(spark, SF)
    out = [
        "# PLANS — physical plans of headline queries (generated by tools/gen_plans.py)",
        "",
        f"Scale factor: {SF}; `local[8]`, AQE on. Regenerate after plan-affecting",
        "changes; plan properties are enforced in tests/test_plans.py.",
        "",
    ]
    for title, fn, commentary in SHOWCASE:
        df = fn(spark)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {title}", "", commentary, "", "```", buf.getvalue().rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


def _basket():
    from kalytical_spark.operators import basket

    return basket


def _segments():
    from kalytical_spark.operators import segments

    return segments


def _maxscore():
    from kalytical_spark.operators import maxscore

    return maxscore


def _colbert():
    from kalytical_spark.operators import colbert

    return colbert


if __name__ == "__main__":
    main()
