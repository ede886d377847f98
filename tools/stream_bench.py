"""Streaming throughput bench (VERDICT r4 task 6): sustained events/sec
through the three stateful streaming paths at a given SF, with the
state-store size curve per micro-batch, persisted to STREAM_BENCH.json
(folded into BENCH_FULL.json by bench.py, like SCALE_SWEEP.json).

Benches:
* ``incubation`` — the applyInPandasWithState dependency-trigger state
  machine (streaming/incubation.py) draining the full lifecycle event log
  as a multi-batch file stream. State rows/bytes per batch come from the
  query's own progress telemetry (stateOperators), so the "does keyed
  state stay bounded" claim is a recorded measurement.
* ``hll_sink`` — the MAX-merge HLL register maintenance sink
  (streaming/sketches.py): events/sec through foreachBatch + versioned
  commits; state size = the register table itself (rows per version).
* ``cms_sink`` — the SUM-fold count-min sink with its exactly-once
  applied-batch ledger; state size = counter table rows per version.

Usage: python tools/stream_bench.py [sf_dir] [n_files]
Defaults: sf_dir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, n_files=8.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/tmp/kalytical_stream_bench"

# transformWithState (statev2 bench) needs google.protobuf in driver AND
# workers: bridge the container-local shim BEFORE the JVM starts, exactly
# like tests/conftest.py. No-op where a real protobuf exists.
_PB_SHIM = os.path.join(REPO, "tools", "protobuf_shim")
try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _PB_BUNDLED = (
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    )
    if os.path.isdir(_PB_SHIM) and os.path.isdir(_PB_BUNDLED):
        sys.path.insert(0, _PB_SHIM)
        os.environ["PYTHONPATH"] = (
            _PB_SHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    try:
        from google.protobuf import descriptor  # noqa: F401

        _HAS_PROTOBUF = True
    except ImportError:
        _HAS_PROTOBUF = False


def _progress_points(q) -> list[dict]:
    """Per-batch telemetry: input rows, duration, and state-store size.

    ``state_bytes`` (stateOperators.memoryUsedBytes) is the provider's
    TOTAL memory accounting — for RocksDB that includes block-cache and
    memtable fill, which climbs toward their configured caps and reads
    like a leak at constant key count (measured: 134KB->742KB over 8
    batches at 1,000 fixed-width keys). ``state_live_bytes`` is the LIVE
    keyed state: RocksDB's sstFileSize (HDFS provider: the
    current-version size metric) — measured as a bounded sawtooth
    (~12.3KB floor per 100 keys, compaction every 4 batches), the metric
    that actually answers "does keyed state stay bounded"."""
    points = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        state = (p.get("stateOperators") or [{}])[0]
        cm = state.get("customMetrics") or {}
        points.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": state.get("numRowsTotal"),
                "state_bytes": state.get("memoryUsedBytes"),
                "state_live_bytes": cm.get(
                    "rocksdbSstFileSize", cm.get("stateOnCurrentVersionSizeBytes")
                ),
            }
        )
    return points


def bench_incubation(spark, sf_dir: str, n_files: int) -> dict:
    from kalytical_spark.streaming.incubation import start_incubation_query

    src = os.path.join(SCRATCH, "lifecycle_events")
    ckpt = os.path.join(SCRATCH, "ckpt_incubation")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    ev = spark.table("lifecycle_events")
    ev.repartition(n_files).write.parquet(src)
    n_events = spark.read.parquet(src).count()
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = start_incubation_query(
        spark, stream, sf_dir, query_name="stream_bench_incubation"
    )
    q.awaitTermination()
    wall = time.time() - t0
    n_fires = spark.sql("SELECT COUNT(*) FROM stream_bench_incubation").collect()[0][0]
    return {
        "events_total": n_events,
        "fires_total": n_fires,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "batches": _progress_points(q),
    }


def _bench_sink(spark, kind: str, n_files: int) -> dict:
    from kalytical_spark import versioned
    from kalytical_spark.streaming.sketches import start_cms_query, start_hll_query

    from kalytical_spark.streaming.sketches import start_quantile_histogram_query

    src = os.path.join(SCRATCH, f"events_{kind}")
    ckpt = os.path.join(SCRATCH, f"ckpt_{kind}")
    table = os.path.join(SCRATCH, f"table_{kind}")
    for d in (src, ckpt, table):
        shutil.rmtree(d, ignore_errors=True)
    ev = spark.table("events_ms").select("event_id", "user_id", "event_type", "value")
    ev.repartition(n_files).write.parquet(src)
    n_events = spark.read.parquet(src).count()
    schema = spark.read.parquet(src).schema
    start = {
        "hll": start_hll_query,
        "cms": start_cms_query,
        "qh": start_quantile_histogram_query,
    }[kind]
    t0 = time.time()
    q = start(spark, src, schema, table, ckpt)
    q.awaitTermination()
    wall = time.time() - t0
    versions = versioned.current_version(table) or 0
    table_rows = (
        versioned.read_version(spark, table).count() if versions else 0
    )
    # rows per committed version: the maintained-state growth curve
    curve = [
        versioned.read_version(spark, table, v).count()
        for v in range(1, versions + 1)
    ]
    return {
        "events_total": n_events,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "versions_committed": versions,
        "final_table_rows": table_rows,
        "table_rows_per_version": curve,
        "batches": _progress_points(q),
    }


def bench_statev2(spark, n_files: int) -> dict:
    """The modern transformWithStateInPandas path (ValueState ledger,
    RocksDB provider, protobuf state server): measures what the typed-
    handle API costs relative to applyInPandasWithState (`incubation`)."""
    from kalytical_spark.streaming import statev2

    src = os.path.join(SCRATCH, "events_statev2")
    ckpt = os.path.join(SCRATCH, "ckpt_statev2")
    for d in (src, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    ev = spark.table("lifecycle_events").select(
        "pipeline_uuid", "event_subtype", "event_time"
    )
    ev.repartition(n_files).write.parquet(src)
    n_events = spark.read.parquet(src).count()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = (
        statev2.pipeline_ledger_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_bench_statev2")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    n_keys = spark.sql(
        "SELECT COUNT(DISTINCT pipeline_uuid) FROM stream_bench_statev2"
    ).collect()[0][0]
    points = _progress_points(q)
    live = [p["state_live_bytes"] for p in points if p.get("state_live_bytes")]
    return {
        "events_total": n_events,
        "keys_total": n_keys,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        # the compaction floor of the live SST bytes: the steady-state
        # keyed-state footprint (memoryUsedBytes is cache-fill accounting,
        # see _progress_points)
        "steady_state_live_bytes": min(live) if live else None,
        "batches": points,
    }


def bench_holt(spark, n_files: int) -> dict:
    """The streaming Holt forecaster (event-time timers + day
    accumulation). Unlike the ledger benches, the replay must be
    TIME-ORDERED (random file splits would make whole days late beyond
    the accumulating one), so chunks are contiguous time ranges plus the
    sentinel file that closes the final day."""
    import pandas as pd

    from kalytical_spark.streaming import statev2

    src = os.path.join(SCRATCH, "events_holt")
    ckpt = os.path.join(SCRATCH, "ckpt_holt")
    for d in (src, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = spark.table("events_ms").select("event_type", "ts")
    n_events = ev.count()
    # bench-tool chunker: contiguous time ranges via ntile (the global
    # window is fine here — this is replay preparation, not a query)
    chunk = ev.withColumn(
        "chunk", F.ntile(n_files).over(W.orderBy("ts", "event_type")) - 1
    )
    for i in range(n_files):
        chunk.filter(f"chunk = {i}").select("event_type", "ts").coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    sentinel_t = ev.agg({"ts": "max"}).collect()[0][0] + pd.Timedelta(days=365)
    spark.createDataFrame(
        pd.DataFrame({"event_type": ["__sentinel__"], "ts": [sentinel_t]})
    ).coalesce(1).write.parquet(os.path.join(src, f"b{n_files}"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = spark.read.parquet(os.path.join(src, "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    t0 = time.time()
    q = (
        statev2.holt_trend_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_bench_holt")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    n_final = spark.sql(
        "SELECT COUNT(*) FROM stream_bench_holt WHERE event_type <> '__sentinel__'"
    ).collect()[0][0]
    return {
        "events_total": n_events,
        "final_rows": n_final,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
    }


def bench_sprt(spark, n_files: int) -> dict:
    """The streaming SPRT early-stopping monitor (event-time timers +
    per-arm day maps). Time-ordered replay like bench_holt, with the
    sentinel file closing every arm's final day."""
    import pandas as pd

    from kalytical_spark.streaming import statev2

    src = os.path.join(SCRATCH, "events_sprt")
    ckpt = os.path.join(SCRATCH, "ckpt_sprt")
    for d in (src, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = spark.table("events_ms").select("event_id", "event_type", "ts")
    n_events = ev.count()
    chunk = ev.withColumn(
        "chunk", F.ntile(n_files).over(W.orderBy("ts", "event_id")) - 1
    )
    for i in range(n_files):
        chunk.filter(f"chunk = {i}").select(
            "event_id", "event_type", "ts"
        ).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    sentinel_t = ev.agg({"ts": "max"}).collect()[0][0] + pd.Timedelta(days=365)
    spark.createDataFrame(
        pd.DataFrame(
            {"event_id": [10**12], "event_type": ["__sentinel__"], "ts": [sentinel_t]}
        )
    ).coalesce(1).write.parquet(os.path.join(src, f"b{n_files}"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = spark.read.parquet(os.path.join(src, "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    t0 = time.time()
    q = (
        statev2.sprt_monitor_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_bench_sprt")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    if prev is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    decisions = spark.sql(
        "SELECT COUNT(DISTINCT arm) FROM stream_bench_sprt"
    ).collect()[0][0]
    return {
        "events_total": n_events,
        "arms": decisions,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
    }


def bench_dedup_sink(spark, sf_dir: str, n_files: int) -> dict:
    """The streaming delta-LSH dedup maintenance sink
    (streaming/dedup_maintenance.py): docs/sec through the per-batch
    band + shingle append, delta x ALL candidate mine, verification, and
    manifest-ledgered delta pair commit. State size = the per-batch pair
    delta dirs (the r11 segment protocol: per-batch pair I/O is
    O(|delta pairs|); the pair-count curve per batch is the cumulative
    sum of delta sizes)."""
    from pyspark.sql import functions as F

    from kalytical_spark.streaming import dedup_maintenance
    from kalytical_spark.streaming.dedup_maintenance import (
        start_dedup_maintenance_query,
    )

    src = os.path.join(SCRATCH, "docs_dedup")
    ckpt = os.path.join(SCRATCH, "ckpt_dedup")
    index = os.path.join(SCRATCH, "index_dedup")
    for d in (src, ckpt, index):
        shutil.rmtree(d, ignore_errors=True)
    docs = spark.table("documents")
    # disjoint one-file shards: each doc ingested exactly once
    for i in range(n_files):
        docs.filter(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_docs = spark.read.parquet(src).count()
    t0 = time.time()
    q = start_dedup_maintenance_query(spark, src, docs.schema, index, ckpt)
    q.awaitTermination()
    wall = time.time() - t0
    applied = sorted(dedup_maintenance._applied(spark, index))
    # per-batch delta pair counts, keyed by BATCH ID. A batch's count is
    # correct as long as its b-dir is still readable — including dirs
    # already FOLDED into a c-segment but not yet swept (deferred GC):
    # the dir still holds exactly that batch's rows. Only batches whose
    # delta dir is gone (swept, or unreadable mid-write leftovers) are
    # listed separately, so sum(pairs_per_delta) == final_pairs exactly
    # when swept_delta_batches is empty, and the gap is attributable by
    # id otherwise — never a silently misaligned positional list.
    delta_counts: dict[str, int] = {}
    swept = []
    for b in applied:
        d = dedup_maintenance._delta_dir(index, "pairs", b)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS")):
            delta_counts[str(b)] = spark.read.parquet(d).count()
        else:
            swept.append(b)
    final_pairs = dedup_maintenance.read_pairs(spark, index).count()
    return {
        "docs_total": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "batches_applied": len(applied),
        "final_pairs": final_pairs,
        "pairs_per_delta": delta_counts,
        "swept_delta_batches": swept,
        "batches": _progress_points(q),
    }


def bench_dedup_sink_point(
    spark, corpus_dir: str, n_shards: int, reps: int = 3
) -> dict:
    """Reproducible production-shard dedup-sink point (the VERDICT r9/r10
    throughput recipe): drain <corpus_dir>/documents.parquet split into
    n_shards one-file shards through a FRESH index per rep, report the
    median docs/s. Corpora: the scale-sweep dirs under
    /tmp/kalytical_scale (docs_k5 = 25k docs, docs_k10 = 50k). Usage:
    python tools/stream_bench.py --dedup-point <corpus_dir> <n_shards>
    (writes a dedup_sink_points entry into STREAM_BENCH.json, keyed
    "<n_docs>docs_x<n_shards>shards", preserving the rest of the file)."""
    from pyspark.sql import functions as F

    from kalytical_spark.streaming.dedup_maintenance import (
        read_pairs,
        start_dedup_maintenance_query,
    )

    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    n = docs.count()
    work = os.path.join(SCRATCH, f"dedup_point_{n}_{n_shards}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "shards")
    for i in range(n_shards):
        docs.filter(F.col("doc_id") % n_shards == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    walls, pair_counts = [], []
    for rep in range(reps):
        ix = os.path.join(work, f"ix{rep}")
        ck = os.path.join(work, f"ck{rep}")
        t0 = time.time()
        q = start_dedup_maintenance_query(spark, src, docs.schema, ix, ck)
        assert q.awaitTermination(600)
        q.stop()
        walls.append(time.time() - t0)
        pair_counts.append(read_pairs(spark, ix).count())
    walls.sort()
    med = walls[len(walls) // 2]
    return {
        "docs_total": n,
        "n_shards": n_shards,
        "runs": reps,
        "wall_sec_median": round(med, 2),
        "docs_per_sec_median": round(n / med, 1),
        "wall_sec_all": [round(w, 2) for w in sorted(walls)],
        "pairs": pair_counts[0],
        "pairs_deterministic": len(set(pair_counts)) == 1,
    }


def main() -> None:
    from kalytical_spark import catalog
    from kalytical_spark.session import get_spark

    if len(sys.argv) > 1 and sys.argv[1] == "--dedup-point":
        corpus_dir, n_shards = sys.argv[2], int(sys.argv[3])
        spark = get_spark("kalytical_stream_bench")
        point = bench_dedup_sink_point(spark, corpus_dir, n_shards)
        out = os.path.join(REPO, "STREAM_BENCH.json")
        try:
            with open(out) as fh:
                payload = json.load(fh)
        except (OSError, ValueError):
            payload = {}
        key = f"{point['docs_total']}docs_x{n_shards}shards"
        payload.setdefault("dedup_sink_points", {})[key] = point
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(json.dumps({key: point}))
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("kalytical_stream_bench")
    catalog.register(spark, sf_dir)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    payload = {
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_microbatches": n_files,
        "incubation": bench_incubation(spark, sf_dir, n_files),
        "statev2_ledger": (
            bench_statev2(spark, n_files)
            if _HAS_PROTOBUF
            else {"skipped": "no google.protobuf in this container"}
        ),
        "holt_forecaster": (
            bench_holt(spark, n_files)
            if _HAS_PROTOBUF
            else {"skipped": "no google.protobuf in this container"}
        ),
        "sprt_monitor": (
            bench_sprt(spark, n_files)
            if _HAS_PROTOBUF
            else {"skipped": "no google.protobuf in this container"}
        ),
        "hll_sink": _bench_sink(spark, "hll", n_files),
        "cms_sink": _bench_sink(spark, "cms", n_files),
        "quantile_sink": _bench_sink(spark, "qh", n_files),
        "dedup_sink": bench_dedup_sink(spark, sf_dir, n_files),
    }
    out = os.path.join(REPO, "STREAM_BENCH.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
