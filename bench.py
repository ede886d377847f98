"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the noop sink (full computation,
no driver-side materialization). The session is warmed first (JVM + domain
view cache) so numbers reflect steady-state query time, not JVM startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.registry import all_queries  # noqa: E402
from kalytical_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every implemented query (registry order). Override with
# SPARK_GRAFT_BENCH_QUERIES=name1,name2 for focused runs.
_ONLY = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _memo_builders():
    """Shared session-memo builds, each reported as its own `memo:*` bench
    line so per-query times are comparable across rounds (previously the
    first family member silently paid the build — BENCH_r03 memo_note).
    Each builder returns a DataFrame to materialize (or None if the build
    is already eager)."""
    from kalytical_spark.operators import (
        colbert,
        components,
        curation,
        dedup,
        kmeans_ivf,
        pq,
        replay,
        setsim,
        similarity,
        sketches,
        spans,
    )

    return [
        # (doc_id, shingle) + banded signature tables: shared by the LSH
        # mine, the incremental delta mine, and the recall report
        ("memo:lsh_signatures", lambda s, d: dedup.signature_tables(s, d)[1]),
        # verified near-dup pair mine: shared by CC, keeper selection,
        # curation, recall report
        ("memo:lsh_pairs", dedup.dedup_minhash_lsh),
        # connected-component labels over the dup graph
        ("memo:cc_labels", components._components),
        # per-document fate ledger: shared by the curation + mix family
        ("memo:curation_fates", curation.pipeline_curate_corpus),
        # learned k-means cells (Lloyd's fit + final assignment)
        ("memo:kmeans_fit", lambda s, d: kmeans_ivf.fit_kmeans_cells(s, d)[0]),
        # IVF-PQ codebooks (residual quantizers + code assignments)
        ("memo:pq_codebooks", lambda s, d: pq._pq_index(s, d)[0]),
        # token-level k-means cells for the pruned MaxSim path (8x the
        # points of the pooled fit: one fit over the exploded token view)
        ("memo:token_kmeans_fit", lambda s, d: colbert.fit_token_cells(s, d)[0]),
        # exact set-similarity verified pairs (prefix join + narrow verify)
        ("memo:setsim_pairs", setsim.dedup_setsim_prefix),
        # duplicated-window position table: shared by the substring-span
        # miner, the rate rollup, and the excise consumer
        ("memo:span_positions", spans._dup_positions),
        # sequential fire-decision ledger (applyInPandas fold)
        ("memo:replay_decisions", replay.dag_replay_decisions),
        # support-thresholded co-purchase edge list: shared by the triangle
        # census, clustering coefficient, k-core, LPA, and link prediction
        ("memo:copurchase_edges", sketches.copurchase_edges),
        # exact brute-force top-k: ground truth for six recall/ranking
        # audits (stored audit artifact in production; the declared
        # sim_topk_bruteforce query itself stays unmemoized)
        ("memo:exact_topk", similarity.exact_topk_memo),
        # exact MaxSim top-k: ground truth for the pruned-MaxSim audit
        ("memo:exact_maxsim", colbert.exact_maxsim_memo),
    ]


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kalytical_bench")
    t_warm = time.time()
    catalog.register(spark, SF_DIR)
    # force domain-view cache materialization once, outside the timings
    spark.table("lifecycle_events").count()
    spark.table("incubating_triggers").count()
    # pay the Python-worker fleet cold start (numpy/OpenBLAS first-call
    # init) here, not inside whichever Pandas-UDF query runs first
    from kalytical_spark.session import warm_python_workers

    warm_python_workers(spark)
    warm_s = time.time() - t_warm

    queries = all_queries()
    names = list(queries)
    if _ONLY:
        names = [n for n in _ONLY.split(",") if n in queries]

    timings: dict[str, float] = {}
    # Pre-pay each shared memo as its own timed line. Focused
    # SPARK_GRAFT_BENCH_QUERIES runs skip this (they measure end-to-end
    # cost) UNLESS SPARK_GRAFT_BENCH_PREPAY_MEMOS=1: the isolated-JVM
    # regression re-measure (tools/bench_diff.py) needs the focused median
    # to be MEMO-WARM like the suite median it is compared against —
    # without the prepay, a memo-consuming query's isolated number carries
    # the shared build and reads as a fake 2-6x regression.
    if not _ONLY or os.environ.get("SPARK_GRAFT_BENCH_PREPAY_MEMOS") == "1":
        for memo_name, build in _memo_builders():
            t0 = time.time()
            try:
                out = build(spark, SF_DIR)
                if out is not None:
                    out.count()  # materialize lazily-cached memos
                timings[memo_name] = round(time.time() - t0, 3)
            except Exception as exc:
                timings[memo_name] = -1.0
                print(f"# bench error {memo_name}: {exc}", file=sys.stderr)
    # Steady-state timing: each query runs 3 times and reports the MEDIAN.
    # Run 1 eats per-query codegen/JIT warmup; the median is immune to a
    # single in-session G1 pause landing on one run (dag_critical_path once
    # measured 17.4s in-session vs 2.9s alone — VERDICT r4 confirmed the
    # apparent round-over-round regressions were exactly this jitter, so
    # cross-round diffs now compare warm medians). First-run times are kept
    # as the separate `cold` map in BENCH_FULL.json.
    cold: dict[str, float] = {}
    for i, name in enumerate(names):
        if i % 15 == 0:
            # nudge a major collection OUTSIDE the timed span: across 120+
            # queries the heap accumulates cached blocks and a G1 full GC
            # otherwise lands on one arbitrary query as a 20-40s outlier
            # (session.py notes); steady-state per-query time is the metric
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        fn, _oracle = queries[name]
        runs: list[float] = []
        try:
            for _ in range(3):
                t0 = time.time()
                run_query(fn(spark, SF_DIR))
                runs.append(round(time.time() - t0, 3))
        except Exception as exc:  # a failing query shouldn't kill the bench
            timings[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)
            continue
        cold[name] = runs[0]
        timings[name] = sorted(runs)[1]

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    n_memos = sum(1 for k in timings if k.startswith("memo:"))
    payload = {
        "metric": "kalytical_spark_headline_queries_total",
        "value": total,  # queries + memo builds: comparable to rounds where builds hid inside queries
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "warmup_sec": round(warm_s, 2),
        "n_queries": len(timings) - n_memos,
        "n_memos": n_memos,
        # shared session memos are pre-paid and reported as their own
        # `memo:*` lines above, so per-query times are build-free and
        # comparable across rounds
        "memo_note": "shared index builds reported as explicit memo:* lines; query lines are memo-warm",
        "timing": "warm median-of-3 per query (cold first-run times in BENCH_FULL.json)",
        # one scalar of first-run behavior in the parsed line (VERDICT r5
        # task 8): per-query cold times stay in BENCH_FULL only
        "cold_total_sec": round(sum(cold.values()), 2),
    }
    # The driver parses the JSON line out of the LAST 2000 bytes of stdout
    # (BENCH_r01.json came back "parsed": null because the full 79-query map
    # overflowed that window). Keep the line under budget by dropping the
    # FASTEST queries from the inline map; the complete map always lands in
    # BENCH_FULL.json next to this script.
    repo = os.path.dirname(os.path.abspath(__file__))
    # cold (first-run) times ride only in BENCH_FULL — the stdout line
    # reports steady-state medians
    payload["cold"] = {k: round(v, 2) for k, v in cold.items()}
    # fold in the persisted scale sweep (tools/scale_bench.py): the sf1-
    # equivalent curve for the LSH/CC/curation chain rides along in
    # BENCH_FULL so the scaling claim is a recorded measurement
    try:
        with open(os.path.join(repo, "SCALE_SWEEP.json")) as fh:
            payload["scale_sweep"] = json.load(fh)
    except (OSError, ValueError):
        pass
    # fold in the persisted streaming throughput bench (tools/stream_bench.py):
    # events/sec through the incubation state machine + HLL/CMS maintenance
    # sinks, with per-batch state-store size curves. Full detail rides in
    # BENCH_FULL; the stdout line carries only the three events/sec numbers.
    try:
        with open(os.path.join(repo, "STREAM_BENCH.json")) as fh:
            stream = json.load(fh)
        payload["streaming"] = stream
        payload["streaming_eps"] = {
            k: stream[k]["events_per_sec"]
            for k in (
                "incubation",
                "statev2_ledger",
                "holt_forecaster",
                "sprt_monitor",
                "hll_sink",
                "cms_sink",
                "quantile_sink",
            )
            if isinstance(stream.get(k), dict) and "events_per_sec" in stream[k]
        }
    except (OSError, ValueError, KeyError):
        pass
    if not _ONLY:
        # focused runs (SPARK_GRAFT_BENCH_QUERIES) must not clobber the
        # full-registry record the round artifacts are built from
        with open(os.path.join(repo, "BENCH_FULL.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
    # the sweep rides only in BENCH_FULL: leaving it in the stdout line
    # would eat most of the driver's 1900-byte parse budget and force the
    # per-query map to be dropped
    payload.pop("scale_sweep", None)
    payload.pop("streaming", None)
    payload.pop("cold", None)
    budget = 1900
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > budget:
        # never drop errored entries (-1.0) or the memo:* attribution lines:
        # a hidden failure is worse than a hidden fast query, and the memo
        # lines are what makes the remaining numbers comparable
        by_time = sorted(
            (k for k in timings if timings[k] >= 0 and not k.startswith("memo:")),
            key=lambda k: timings[k],
            reverse=True,
        )
        while len(line) > budget and by_time:
            dropped = by_time.pop()
            del payload["queries"][dropped]
            payload["queries_omitted"] = len(timings) - len(payload["queries"])
            line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
