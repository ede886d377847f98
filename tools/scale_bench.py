"""Scale sweep for the dedup/LSH + CC + curation chain: measure the
chain's wall time at k x the sf0.1 documents table (k=1..10; k=10 is the
sf1-equivalent corpus) and record the curve in SCALE_SWEEP.json, which
bench.py folds into BENCH_FULL.json under "scale_sweep".

The scaled corpus is built by REPLICATION WITH DISJOINT VOCABULARIES:
replica r rewrites every token t -> "t~r" (r>0), so replicas share no
shingles and contribute no cross-replica candidate pairs. That preserves
the *per-document* duplicate structure of the driver-generated corpus
exactly k times over — corpus k x bigger => pair work k x bigger — which
is the honest linear-scaling shape a sharded 100 TB ingest has (shards
don't near-dup each other either). Replicating verbatim would instead
plant C(k,2) exact dups per document and force a quadratic pair blowup
no engine design could avoid.

Only the documents table scales; the chain reads nothing else. Scratch
parquet lives under /tmp (testdata is read-only). This tool measures
performance scaling only — correctness is the oracle gate's job, on the
unmodified driver tables.

Usage: python tools/scale_bench.py [k1,k2,...]   (default 1,2,5,10)
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

# the chain under test, in dependency order (each is a registry query or
# the memo build feeding one)
CHAIN = [
    ("memo:lsh_signatures", "dedup", lambda m, s, d: m.signature_tables(s, d)[1]),
    ("memo:lsh_pairs", "dedup", lambda m, s, d: m.dedup_minhash_lsh(s, d)),
    ("dedup_cluster_components", "components", lambda m, s, d: m.dedup_cluster_components(s, d)),
    ("dedup_keeper_selection", "components", lambda m, s, d: m.dedup_keeper_selection(s, d)),
    ("pipeline_curate_corpus", "curation", lambda m, s, d: m.pipeline_curate_corpus(s, d)),
]


def build_scaled_dir(spark, k: int) -> str:
    out = os.path.join(SCRATCH, f"k{k}")
    docs_path = os.path.join(out, "documents.parquet")
    # _SUCCESS gates cache reuse: a sweep killed mid-write must rebuild,
    # not silently measure a torn corpus
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        shutil.rmtree(docs_path, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
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
        reps.write.mode("overwrite").parquet(docs_path)
        # the chain only reads documents; link the other tables unmodified
        for f in os.listdir(BASE_SF):
            if f != "documents.parquet" and not os.path.exists(os.path.join(out, f)):
                src = os.path.join(BASE_SF, f)
                dst = os.path.join(out, f)
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                else:
                    shutil.copyfile(src, dst)
    return out


def run_chain(spark, sf_dir: str) -> dict[str, float]:
    from kalytical_spark.operators import components, curation, dedup

    mods = {"dedup": dedup, "components": components, "curation": curation}
    # fresh memos per scale point: the caches are keyed by (session, sf_dir),
    # and each k uses its own sf_dir, so no cross-contamination — but clear
    # cached blocks from the previous point to keep memory comparable
    timings: dict[str, float] = {}
    for name, mod, fn in CHAIN:
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        t0 = time.time()
        df = fn(mods[mod], spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_single(k: int) -> None:
    """One scale point in THIS process (fresh JVM): measured numbers must
    reflect the chain at scale k, not heap garbage accumulated by smaller
    points (a shared session measured 58s for a build a fresh one does in
    7.7s at k=10)."""
    from kalytical_spark import catalog
    from kalytical_spark.session import get_spark

    spark = get_spark("kalytical_scale_bench")
    sf_dir = build_scaled_dir(spark, k)
    catalog.register(spark, sf_dir)
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    t0 = time.time()
    timings = run_chain(spark, sf_dir)
    print(
        "RESULT"
        + json.dumps(
            {
                "n_docs": n_docs,
                "chain_total_sec": round(time.time() - t0, 3),
                "queries": timings,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]))
        return
    import subprocess

    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,5,10").split(",")]
    sweep: dict[str, dict] = {}
    for k in ks:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(k)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # one stuck point must not lose the completed ones: skip it and
            # still persist the sweep below
            print(f"# scale point k={k} timed out after 1800s", file=sys.stderr)
            continue
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("RESULT")), None
        )
        if line is None:
            print(f"# scale point k={k} failed:\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        sweep[f"k{k}"] = json.loads(line[len("RESULT"):])
        print(json.dumps({f"k{k}": sweep[f"k{k}"]}), flush=True)

    # merge into the persisted sweep: a focused rerun of one k refreshes
    # that point without dropping the others
    sweep_path = os.path.join(REPO, "SCALE_SWEEP.json")
    points: dict[str, dict] = {}
    try:
        with open(sweep_path) as fh:
            points = json.load(fh).get("points", {})
    except (OSError, ValueError):
        pass
    points.update(sweep)
    payload = {
        "base_sf": 0.1,
        "note": (
            "k=10 is the sf1-equivalent documents corpus; replicas use "
            "disjoint vocabularies so pair structure scales linearly by "
            "construction — the measured curve shows whether the ENGINE does"
        ),
        "points": dict(sorted(points.items(), key=lambda kv: int(kv[0][1:]))),
    }
    with open(sweep_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"scale_sweep": payload}))


if __name__ == "__main__":
    main()
