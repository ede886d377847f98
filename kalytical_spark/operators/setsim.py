"""Prefix-filtered exact set-similarity join (PPJoin-style) over document
shingle sets — the third leg of the near-dup stool alongside the
exhaustive inverted-index miner (dedup.py dedup_ngram_jaccard) and the
probabilistic MinHash+LSH path (dedup_minhash_lsh):

- exhaustive: exact answer, indexes EVERY shingle (fan-out = every
  shared token);
- LSH: sub-quadratic but probabilistic (banding can miss pairs);
- prefix filter (here): EXACT answer with sub-quadratic candidate
  generation — only each set's PREFIX (its rarest ``|s| - ceil(t*|s|) +
  1`` tokens under one global token order) is indexed, and the prefix
  filtering theorem guarantees any pair with Jaccard >= t shares a
  prefix token, so pruning loses nothing.

The global order is (document frequency asc, shingle asc) — rarest
first, deterministically tie-broken — which makes prefix postings lists
short exactly where the corpus is dense: a stopword shingle shared by
half the corpus lands in almost no prefixes, killing the quadratic
bucket the exhaustive join would build. The PPJoin length filter
(t*|larger| <= |smaller|, integer cross-multiplied) prunes candidates
before verification.

Scale: df counting and prefix ranking are one groupBy + per-doc window;
the candidate join runs over prefix postings only; verification touches
candidate pairs times their shingles. The df dim is vocabulary-sized, so
it rides a shuffle_hash join (never broadcast — repo convention).

Proof: the DuckDB twin is the exhaustive inverted-index join at the same
threshold — prefix pruning is exact, so the outputs must match
value-for-value (this is the strongest kind of correctness check for a
pruning technique: the oracle does NOT implement the pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import app_key, session_memo
from .dedup import _SQL_SHINGLES, shingle_table

SETSIM_T_MILLI = 500  # Jaccard threshold 0.5, integer cross-multiplied

# session memo of the verified pair set (the dedup._PAIR_CACHE pattern):
# like the LSH mine, the exact-Jaccard pair table is a stored artifact in
# production — repeated calls read it instead of re-running the prefix
# join. bench.py prepays the build as its own memo:setsim_pairs line.
_SETSIM_CACHE: dict[tuple[str, str], DataFrame] = session_memo({})


def _prefix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs surviving the prefix + length + positional filters
    (doc_a, doc_b, n_a, n_b) — the pre-verification set whose cardinality
    is the scale story of this operator (tools/scale_bench.py's textdedup
    chain records it per scale point).

    Consumes the SHINGLE memo layer only (dedup.shingle_table): charging
    this path the minhash/banding build too cost a measured 29s of the
    229s textdedup k100 sweep leg for a table the prefix join never
    reads (r9)."""
    sh = shingle_table(spark, sf_dir)
    df = sh.groupBy("shingle").agg(F.count("*").cast("bigint").alias("sh_df"))
    wdoc = W.partitionBy("doc_id").orderBy("sh_df", "shingle")
    # prefix postings carry the token's xxhash64 FINGERPRINT, not the
    # ~30-byte shingle string: the candidate self-join then shuffles and
    # compares 8-byte longs (r10 — measured 42.7 -> 22.8 s warm at the
    # k100 corpus, candidate count byte-identical at 12,499,583). This is
    # lossless EVEN UNDER hash collisions, unconditionally: a token always
    # maps to one fingerprint, so a collision can only MERGE two different
    # tokens — producing extra candidates that exact verification rejects
    # — never lose a shared-prefix match. (Stronger than the verify
    # arrays' injectivity argument below: no vocabulary-size bet at all.)
    ranked = sh.join(df.hint("shuffle_hash"), "shingle").select(
        "doc_id",
        F.xxhash64("shingle").alias("fp"),
        F.row_number().over(wdoc).alias("rn"),
        F.count("*").over(W.partitionBy("doc_id")).alias("n_sh"),
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n_sh")
        - F.expr(f"({SETSIM_T_MILLI} * n_sh + 999) div 1000")
        + 1
    ).select("doc_id", "fp", "n_sh", "rn")
    a, b = prefix.alias("a"), prefix.alias("b")
    # prefix rows carry each doc's set size and the token's per-doc rank,
    # so candidate pairs get (n_a, n_b) and the POSITIONAL filter for
    # free — no separate sizes aggregate, no size joins. Positional
    # filter (the second PPJoin theorem): the globally-rarest shared
    # token sits at ranks (i, j) = (min rn_a, min rn_b) — both minima
    # are achieved by the same token because per-doc ranks restrict one
    # global order — and every other shared token ranks after it in BOTH
    # docs, so overlap <= 1 + min(n_a - i, n_b - j). J >= t needs
    # overlap * (1000 + t_milli) >= t_milli * (n_a + n_b). Random pairs
    # share only COMMON tokens, which rank late under rarest-first order,
    # so this is the filter that kills the accidental candidate mass.
    cand = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # PPJoin length filter: J >= t requires t*|larger| <= |smaller|
            & (
                1000 * F.least("a.n_sh", "b.n_sh")
                >= SETSIM_T_MILLI * F.greatest("a.n_sh", "b.n_sh")
            )
            # positional bound applied PER JOINED ROW, ahead of the
            # aggregate (r9): per-doc ranks restrict ONE global order, so
            # the pair's rarest shared token achieves (min rn_a, min rn_b)
            # simultaneously and every other shared token ranks after it
            # in BOTH docs — the bound is monotonically tighter in (rn_a,
            # rn_b), so dropping rows that fail on their own ranks can
            # never drop a pair whose minimizing row passes, and if the
            # minimizing row fails every row fails. Same expression as the
            # post-aggregate filter below; here it shrinks the groupBy
            # shuffle (the dominant exchange of candidate generation).
            & (
                (1000 + SETSIM_T_MILLI)
                * (
                    1
                    + F.least(
                        F.col("a.n_sh") - F.col("a.rn"),
                        F.col("b.n_sh") - F.col("b.rn"),
                    )
                )
                >= SETSIM_T_MILLI * (F.col("a.n_sh") + F.col("b.n_sh"))
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").cast("bigint").alias("n_a"),
            F.col("b.n_sh").cast("bigint").alias("n_b"),
        )
        .agg(
            F.min("a.rn").alias("first_i"),
            F.min("b.rn").alias("first_j"),
        )
        .filter(
            (1000 + SETSIM_T_MILLI)
            * (
                1
                + F.least(
                    F.col("n_a") - F.col("first_i"),
                    F.col("n_b") - F.col("first_j"),
                )
            )
            >= SETSIM_T_MILLI * (F.col("n_a") + F.col("n_b"))
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    return cand


def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 near-dup pairs via prefix-filtered candidate
    generation. Output contract matches the exhaustive miner (doc_a <
    doc_b, intersection/size counts, double jaccard); only the plan
    differs — prefix postings instead of full postings.

    Verification joins each candidate pair against PRE-AGGREGATED token
    FINGERPRINT arrays (one row per doc) and intersects JVM-side: two
    |cand|-row hash joins instead of the posting-list fan-out
    (|cand| x avg set size intermediate rows — measured 3x the wall at
    the k100 sweep point) plus its re-aggregation shuffle. Set sizes are
    document-bounded, so the per-row array_intersect is O(set size) with
    no skew exposure.

    Verify-payload shape (VERDICT r7 task 2 — the old raw-string form
    spilled 26.3 GB mem + 11.1 GB disk at the textdedup k100 point):

    * elements are xxhash64 token fingerprints (8-byte primitive longs in
      Tungsten's UnsafeArrayData) instead of ~30-byte UTF8 shingles —
      |A cap B| is unchanged as long as the hash is injective over the
      corpus vocabulary (collision odds ~V^2/2^65; a collision would
      surface as an oracle value-hash mismatch, never silently — swap in
      a 128-bit two-long struct at trillion-token vocabularies);
    * the doc->array rollup is built only for docs that appear in a
      candidate pair (semi-join prune, same move as dedup_minhash_lsh);
    * both pair joins are SHUFFLED HASH, not sort-merge: the measured
      spill was the sort buffering array-carrying rows, and partition
      count provably cannot shrink it (BENCH_NOTES.md r7 experiment) —
      a hash join streams the probe side and never sorts the payload."""
    memo_key = (app_key(spark), sf_dir)
    if memo_key in _SETSIM_CACHE:
        return _SETSIM_CACHE[memo_key]
    # materialize the candidate table ONCE: three consumers read it (both
    # branches of the cand_ids union + the verify join), and uncached each
    # re-ran the whole prefix self-join — measured 3 x 4.4 s of the 14.5 s
    # sf0.1 wall (r8). Narrow rows: ~40 B x pair count (~500 MB at the
    # textdedup k100 point), unpersisted as soon as the verified pair set
    # materializes below.
    cand = _prefix_candidates(spark, sf_dir).cache()
    cand.count()
    result = setsim_pairs_plan(spark, sf_dir, cand).cache()
    result.count()  # materialize the (small) pair set, then free the candidates
    cand.unpersist()
    _SETSIM_CACHE[memo_key] = result
    return result


def setsim_pairs_plan(
    spark: SparkSession, sf_dir: str, cand: DataFrame | None = None
) -> DataFrame:
    """The UNCACHED verify pipeline over a candidate frame — the single
    construction the memoized query materializes and the plan-fingerprint
    gate pins structurally (a memo-warm read executes as one cached scan,
    which would blind the gate to this plan)."""
    sh = shingle_table(spark, sf_dir)
    if cand is None:
        cand = _prefix_candidates(spark, sf_dir)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # the semi-join is explicitly shuffle_hash: sh already carries
    # hashpartitioning(doc_id) from the shingle build, so only the small
    # cand_ids side shuffles — and the hint makes the plan ESTIMATE-FREE
    # (unhinted, the planner flipped this join between broadcast and
    # sort-merge on a cached-size-estimate boundary that moves with
    # partition count; the fingerprint gate pins the hinted static shape).
    # Broadcast would be the wrong call at 100 TB anyway: candidate-doc
    # ids scale with corpus size, the one thing a broadcast must not do.
    docsets = (
        sh.join(cand_ids.hint("shuffle_hash"), "doc_id", "leftsemi")
        .groupBy("doc_id")
        .agg(F.collect_list(F.xxhash64("shingle")).alias("sh_set"))
    )
    jac = (
        cand.join(
            docsets.select(
                F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("sa")
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("sb")
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("sa", "sb")).cast("bigint").alias("n_inter"),
        )
        .filter(
            1000 * F.col("n_inter")
            >= SETSIM_T_MILLI * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    )
    return jac.select(
        "doc_a",
        "doc_b",
        "n_inter",
        "n_a",
        "n_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    )


ORACLE_SETSIM_PREFIX = f"""
WITH sh AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE)
         AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE 1000 * n_inter >= {SETSIM_T_MILLI} * (sa.n_sh + sb.n_sh - n_inter)
"""


QUERIES: dict[str, tuple] = {
    "dedup_setsim_prefix": (dedup_setsim_prefix, ORACLE_SETSIM_PREFIX),
}
