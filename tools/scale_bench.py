"""Scale sweeps for two flagship chains: measure wall time at k x the
sf0.1 base tables (k=10 is the sf1-equivalent corpus) and record the
curves in SCALE_SWEEP.json, which bench.py folds into BENCH_FULL.json
under "scale_sweep".

Chains:
* ``docs`` — the dedup/LSH + connected-components + curation chain over a
  k-x documents table. Replication uses DISJOINT VOCABULARIES: replica r
  rewrites every token t -> "t~r" (r>0), so replicas share no shingles
  and contribute no cross-replica candidate pairs. That preserves the
  *per-document* duplicate structure of the driver-generated corpus
  exactly k times over — corpus k x bigger => pair work k x bigger —
  the honest linear-scaling shape a sharded 100 TB ingest has (shards
  don't near-dup each other either). Replicating verbatim would instead
  plant C(k,2) exact dups per document and force a quadratic pair blowup
  no engine design could avoid.
* ``events`` — the behavioral/window chain (sessionization, rolling WAU,
  robust outliers, tumbling windows) plus the sequential replay fold,
  over a k-x events table. Replicas shift user_id and event_id into
  disjoint ranges with timestamps unchanged: k x more users at the same
  event density per user, so per-key window work stays constant while
  key volume scales — and the replay fold's per-PIPELINE event streams
  grow k x (pipeline ids are user_id mod a fixed supplier count), which
  stresses the one genuinely sequential per-key path.

Only the chain's driving table scales; other tables link unmodified.
Scratch parquet lives under /tmp (testdata is read-only). This tool
measures performance scaling only — correctness is the oracle gate's
job, on the unmodified driver tables.

Usage: python tools/scale_bench.py [chain] [k1,k2,...]
Defaults: chain=docs, ks=1,2,5,10.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/tmp/kalytical_scale"


def _docs_chain():
    from kalytical_spark.operators import components, curation, dedup

    return [
        ("memo:lsh_signatures", lambda s, d: dedup.signature_tables(s, d)[1]),
        ("memo:lsh_pairs", dedup.dedup_minhash_lsh),
        ("dedup_cluster_components", components.dedup_cluster_components),
        ("dedup_keeper_selection", components.dedup_keeper_selection),
        ("pipeline_curate_corpus", curation.pipeline_curate_corpus),
    ]


def _events_chain():
    from kalytical_spark.operators import events, mutations, replay, timeseries

    return [
        ("events_sessionization", events.events_sessionization),
        ("events_rolling_wau", timeseries.events_rolling_wau),
        ("events_robust_outliers", timeseries.events_robust_outliers),
        ("events_tumbling_windows", mutations.events_tumbling_windows),
        ("memo:replay_decisions", replay.dag_replay_decisions),
    ]


def _emb_chain():
    from kalytical_spark.operators import colbert, dedup, embedding_stats, kmeans_ivf

    return [
        ("memo:kmeans_fit", lambda s, d: kmeans_ivf.fit_kmeans_cells(s, d)[0]),
        ("sim_topk_kmeans_ivf", kmeans_ivf.sim_topk_kmeans_ivf),
        ("emb_label_coherence", embedding_stats.emb_label_coherence),
        ("emb_centroid_drift", embedding_stats.emb_centroid_drift),
        ("dedup_embedding_pairs", dedup.dedup_embedding_pairs),
        # late-interaction scale path: token-level fit (8x the points,
        # constant cell size so K grows with the corpus) + probe/re-rank
        # of a FIXED query workload (the base-replica queries: vec_ids
        # are replicated upward, so <= base max keeps the same 20 queries
        # at every k — production retrieval is fixed QPS against a
        # growing corpus)
        ("memo:token_kmeans_fit", lambda s, d: colbert.fit_token_cells(s, d)[0]),
        (
            "sim_maxsim_ivf_pruned",
            lambda s, d: colbert.sim_maxsim_ivf_pruned(s, d, max_query_id=1999),
        ),
    ]


def _textdedup_chain():
    """The r5 exact-text-dedup family (VERDICT r6 task 3): PPJoin
    set-similarity + substring-span mining + excision. ``count:`` entries
    record cardinalities next to wall time — candidate-pair mass is the
    scale story for a pruning join (a wall number alone can't show the
    filter keeping candidates subquadratic)."""
    from kalytical_spark.operators import maxscore, setsim, spans

    return [
        ("count:setsim_candidate_pairs", setsim._prefix_candidates),
        ("dedup_setsim_prefix", setsim.dedup_setsim_prefix),
        ("count:span_dup_positions", spans._dup_positions),
        ("dedup_substring_spans", spans.dedup_substring_spans),
        ("dedup_substring_excise", spans.dedup_substring_excise),
        # max-score retrieval: the prune threshold comes from per-bucket
        # maxima, so the leg measures whether candidate work stays
        # proportional to essential-posting mass as the corpus grows
        ("text_maxscore_topk", maxscore.text_maxscore_topk),
    ]


def _neardupeval_chain():
    """The r6 pair-eval tier (BLEU-2, threshold sweep, MinHash
    calibration): all three consume the verified pair set, so their wall
    must track PAIR COUNT (linear under disjoint-vocabulary replication),
    not corpus size — the ``count:`` column records the pair mass the
    evals are bounded by."""
    from kalytical_spark.operators import dedup, pairscore

    return [
        ("memo:lsh_signatures", lambda s, d: dedup.signature_tables(s, d)[1]),
        ("count:verified_pairs", dedup.dedup_minhash_lsh),
        ("text_bleu_near_pairs", pairscore.text_bleu_near_pairs),
        ("dedup_threshold_sweep", pairscore.dedup_threshold_sweep),
        ("dedup_minhash_calibration", pairscore.dedup_minhash_calibration),
    ]


def _facts_chain():
    from kalytical_spark.operators import basket, quantiles, relational, warehouse

    return [
        ("q1_pricing_summary", relational.q1_pricing_summary),
        ("q9_product_type_profit", warehouse.q9_product_type_profit),
        ("sketch_quantile_decades", quantiles.sketch_quantile_decades),
        # honest k x fan-out through the basket pair expansion (orderkeys
        # shift per replica, part keys stay -> k x pair instances)
        ("orders_market_basket", basket.orders_market_basket),
    ]


def _spreademb_chain():
    """The r11 spread()-touched FLOP-dense embedding paths (VERDICT r11
    item 6): exact MaxSim and brute-force cosine. Run this chain at one
    k with --pin 8 and --pin 32 — the recorded @cN points' ratio is the
    core-scaling evidence the r11 isolated stage timings lacked."""
    from kalytical_spark.operators import colbert, similarity

    return [
        ("sim_maxsim_topk", colbert.sim_maxsim_topk),
        ("sim_topk_bruteforce", similarity.sim_topk_bruteforce),
    ]


def _spreadmm_chain():
    """The r11 spread()-touched multimodal decode seam (same evidence
    protocol as _spreademb_chain): every decode consumes
    multimodal._with_payload."""
    from kalytical_spark.operators import image, multimodal

    return [
        ("mm_image_rle_roundtrip", image.mm_image_rle_roundtrip),
        ("mm_decode_features", multimodal.mm_decode_features),
    ]


CHAINS = {
    "docs": _docs_chain,
    "events": _events_chain,
    "facts": _facts_chain,
    "emb": _emb_chain,
    "textdedup": _textdedup_chain,
    "neardupeval": _neardupeval_chain,
    "spreademb": _spreademb_chain,
    "spreadmm": _spreadmm_chain,
}


def _replicate_docs(spark, base_path: str, k: int):
    docs = spark.read.parquet(base_path)
    n = docs.count()
    reps = None
    for r in range(k):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10 * n))
        if r > 0:
            # disjoint vocabulary per replica: t -> t~r for every token
            part = part.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit(f"~{r}")),
                    ),
                    " ",
                ),
            )
        reps = part if reps is None else reps.unionByName(part)
    return reps


def _replicate_events(spark, base_path: str, k: int):
    ev = spark.read.parquet(base_path)
    maxes = ev.agg(
        F.max("event_id").alias("me"), F.max("user_id").alias("mu")
    ).collect()[0]
    e_off, u_off = int(maxes.me) + 1, int(maxes.mu) + 1
    reps = None
    for r in range(k):
        part = ev.withColumn(
            "event_id", F.col("event_id") + F.lit(r * e_off)
        ).withColumn("user_id", F.col("user_id") + F.lit(r * u_off))
        reps = part if reps is None else reps.unionByName(part)
    return reps


def _replicate_embeddings(spark, base_path: str, k: int):
    """Replicas shift vec_id AND label into disjoint ranges: k x more
    vectors arranged as k x more constant-size label blocks — the honest
    sharded-corpus shape (new crawl shards bring new clusters; existing
    blocks do not inflate). Vector values are unchanged, so quantized
    arithmetic and recall geometry per block stay identical."""
    emb = spark.read.parquet(base_path)
    maxes = emb.agg(
        F.max("vec_id").alias("mv"), F.max("label").alias("ml")
    ).collect()[0]
    v_off, l_off = int(maxes.mv) + 1, int(maxes.ml) + 1
    reps = None
    for r in range(k):
        part = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * v_off)
        ).withColumn(
            "label", (F.col("label") + F.lit(r * l_off)).cast("int")
        )
        reps = part if reps is None else reps.unionByName(part)
    return reps


def _replicate_lineitem(spark, base_path: str, k: int):
    """Replicas shift l_orderkey into disjoint ranges (same part/supplier
    keys, so dim joins fan out k x — the honest shape of a k x bigger fact
    table against fixed dims)."""
    li = spark.read.parquet(base_path)
    off = int(li.agg(F.max("l_orderkey")).collect()[0][0]) + 1
    reps = None
    for r in range(k):
        part = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * off))
        reps = part if reps is None else reps.unionByName(part)
    return reps


_SCALED_TABLE = {
    "docs": "documents.parquet",
    "events": "events.parquet",
    "facts": "lineitem.parquet",
    "emb": "embeddings.parquet",
    "textdedup": "documents.parquet",
    "neardupeval": "documents.parquet",
    "spreademb": "embeddings.parquet",
    "spreadmm": "documents.parquet",
}
_REPLICATE = {
    "docs": _replicate_docs,
    "events": _replicate_events,
    "facts": _replicate_lineitem,
    "emb": _replicate_embeddings,
    # disjoint-vocabulary replication: per-replica duplicate structure is
    # preserved exactly k times over, so candidate mass SHOULD scale
    # linearly — the recorded count column shows whether it does
    "textdedup": _replicate_docs,
    # pair-eval tier rides the same replication (pairs scale linearly)
    "neardupeval": _replicate_docs,
    "spreademb": _replicate_embeddings,
    "spreadmm": _replicate_docs,
}


def build_scaled_dir(spark, chain: str, k: int) -> str:
    out = os.path.join(SCRATCH, f"{chain}_k{k}")
    table = _SCALED_TABLE[chain]
    scaled_path = os.path.join(out, table)
    # _SUCCESS gates cache reuse: a sweep killed mid-write must rebuild,
    # not silently measure a torn corpus
    if not os.path.exists(os.path.join(scaled_path, "_SUCCESS")):
        shutil.rmtree(scaled_path, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        reps = _REPLICATE[chain](spark, os.path.join(BASE_SF, table), k)
        reps.write.mode("overwrite").parquet(scaled_path)
        # the chain only reads its scaled table; link the rest unmodified
        for f in os.listdir(BASE_SF):
            if f != table and not os.path.exists(os.path.join(out, f)):
                src = os.path.join(BASE_SF, f)
                dst = os.path.join(out, f)
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                else:
                    shutil.copyfile(src, dst)
    return out


def _exec_metrics(spark) -> tuple[int, int, int]:
    """Cumulative (memorySpilled, diskSpilled, shuffleWrite) bytes across
    all completed stages, read from the app status store — per-entry
    DELTAS of these are the diagnosis column for a superlinear wall leg
    (VERDICT r6 task 4: linear-on-paper plans whose measured wall jumps
    are either spill or a plan change; the fingerprint gate covers plans,
    this covers spill). Returns (-1,-1,-1) if the internal API moves."""
    try:
        from py4j.java_gateway import JavaObject  # noqa: F401

        sc = spark.sparkContext
        jvm = sc._jvm
        empty = jvm.java.util.Collections.emptyList()
        # AppStatusStore.stageList(JList[StageStatus], boolean details,
        # boolean withSummaries, double[] quantiles, JList[TaskStatus])
        empty_doubles = sc._gateway.new_array(jvm.double, 0)
        seq = (
            sc._jsc.sc()
            .statusStore()
            .stageList(empty, False, False, empty_doubles, empty)
        )
        mem = disk = shuf = 0
        for i in range(seq.size()):
            s = seq.apply(i)
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
            shuf += s.shuffleWriteBytes()
        return mem, disk, shuf
    except Exception:
        return -1, -1, -1


def run_chain(spark, chain: str, sf_dir: str):
    """(timings, counts, spill): a ``count:`` chain entry records the
    entry's row count (candidate mass etc.) instead of a noop write — the
    cardinality column scale curves need next to wall time. ``spill``
    records per-entry (spill_mb, shuffle_write_mb) deltas."""
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    spill: dict[str, dict] = {}
    for name, fn in CHAINS[chain]():
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        m0, d0, s0 = _exec_metrics(spark)
        t0 = time.time()
        if name.startswith("count:"):
            counts[name[len("count:") :]] = fn(spark, sf_dir).count()
        else:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        m1, d1, s1 = _exec_metrics(spark)
        if m0 >= 0 and m1 >= 0:
            spill[name] = {
                "mem_spill_mb": round((m1 - m0) / 1e6, 1),
                "disk_spill_mb": round((d1 - d0) / 1e6, 1),
                "shuffle_write_mb": round((s1 - s0) / 1e6, 1),
            }
    return timings, counts, spill


def run_single(chain: str, k: int) -> None:
    """One scale point in THIS process (fresh JVM): measured numbers must
    reflect the chain at scale k, not heap garbage accumulated by smaller
    points (a shared session measured 58s for a build a fresh one does in
    7.7s at k=10)."""
    from kalytical_spark import catalog
    from kalytical_spark.session import get_spark, warm_python_workers

    spark = get_spark("kalytical_scale_bench")
    sf_dir = build_scaled_dir(spark, chain, k)
    catalog.register(spark, sf_dir)
    warm_python_workers(spark)  # fleet cold start is not a scale curve
    n_rows = spark.read.parquet(
        os.path.join(sf_dir, _SCALED_TABLE[chain])
    ).count()
    t0 = time.time()
    timings, counts, spill = run_chain(spark, chain, sf_dir)
    out = {
        "n_rows": n_rows,
        "chain_total_sec": round(time.time() - t0, 3),
        "queries": timings,
    }
    if counts:
        out["counts"] = counts
    if spill:
        out["spill"] = spill
    print("RESULT" + json.dumps(out))


def _point_sort_key(name: str):
    chain, _, kpart = name.partition(":k")
    kpart, _, pin = kpart.partition("@c")
    return (chain, int(kpart or 0), int(pin or 0))


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--single":
        run_single(sys.argv[2], int(sys.argv[3]))
        return
    import subprocess

    args = sys.argv[1:]
    runs = 1
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    # --pin N: run each fresh-JVM point under taskset -c 0-(N-1) with
    # SPARK_GRAFT_CPUS=N — a fixed CPU set below the box's core count
    # leaves scheduler headroom for background load, narrowing bands
    # (VERDICT r9 task 6). Pinned points record a "pin" field and are
    # only comparable to other points at the same pin.
    pin = 0
    if "--pin" in args:
        i = args.index("--pin")
        pin = int(args[i + 1])
        del args[i : i + 2]
    if args and args[0] in CHAINS:
        chain = args[0]
        ks_arg = args[1] if len(args) > 1 else "1,2,5,10"
    else:
        chain = "docs"  # bare-ks invocation keeps the original CLI shape
        ks_arg = args[0] if args else "1,2,5,10"
    ks = [int(x) for x in ks_arg.split(",")]

    sweep: dict[str, dict] = {}
    for k in ks:
        # --runs N: N fresh-JVM runs per point, per-entry MEDIAN recorded
        # (VERDICT r8 task 6: single-shot sweep points on CPU-bound legs
        # carry ~2x run-to-run variance; a median-marked point is the
        # re-measure-before-believing rule applied at write time)
        results = []
        for _ in range(runs):
            cmd = [sys.executable, os.path.abspath(__file__), "--single", chain, str(k)]
            env = dict(os.environ)
            if pin:
                env["SPARK_GRAFT_CPUS"] = str(pin)
                cmd = ["taskset", "-c", f"0-{pin - 1}"] + cmd
            try:
                proc = subprocess.run(
                    cmd,
                    capture_output=True,
                    text=True,
                    timeout=1800,
                    env=env,
                )
            except subprocess.TimeoutExpired:
                # one stuck point must not lose the completed ones: skip it
                # and still persist the sweep below
                print(f"# scale point {chain}:k{k} timed out after 1800s", file=sys.stderr)
                continue
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("RESULT")), None
            )
            if line is None:
                print(
                    f"# scale point {chain}:k{k} failed:\n{proc.stderr[-2000:]}",
                    file=sys.stderr,
                )
                continue
            results.append(json.loads(line[len("RESULT"):]))
        if not results:
            continue
        point = results[-1]  # counts/spill from the last completed run
        if len(results) > 1:
            import statistics

            point["queries"] = {
                name: round(statistics.median(r["queries"][name] for r in results), 3)
                for name in point["queries"]
            }
            point["chain_total_sec"] = round(
                statistics.median(r["chain_total_sec"] for r in results), 3
            )
            point["runs"] = len(results)
        if pin:
            point["pin"] = pin
        # pinned points get their own key so an 8-core and a 32-core run
        # of the same scale point coexist — the @cN pair IS the recorded
        # core-scaling evidence (VERDICT r11 item 6)
        key = f"{chain}:k{k}@c{pin}" if pin else f"{chain}:k{k}"
        sweep[key] = point
        print(json.dumps({key: sweep[key]}), flush=True)

    # merge into the persisted sweep: a focused rerun of one point
    # refreshes it without dropping the others
    sweep_path = os.path.join(REPO, "SCALE_SWEEP.json")
    points: dict[str, dict] = {}
    try:
        with open(sweep_path) as fh:
            old = json.load(fh).get("points", {})
        # migrate pre-chain keys ("k1") to the docs chain
        points = {(k if ":" in k else f"docs:{k}"): v for k, v in old.items()}
    except (OSError, ValueError):
        pass
    points.update(sweep)
    payload = {
        "base_sf": 0.1,
        "note": (
            "k=10 is the sf1-equivalent table; docs replicas use disjoint "
            "vocabularies and events replicas disjoint user/event id "
            "ranges, so work scales linearly by construction — the "
            "measured curve shows whether the ENGINE does. Points carrying "
            "a 'runs' field are per-entry MEDIANS over that many fresh-JVM "
            "runs (--runs, r9); points without it are single-shot — apply "
            "the re-measure-before-believing rule to those."
        ),
        "points": dict(sorted(points.items(), key=lambda kv: _point_sort_key(kv[0]))),
    }
    with open(sweep_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"scale_sweep": payload}))


if __name__ == "__main__":
    main()
