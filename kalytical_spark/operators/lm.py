"""Held-out language-model estimation over the documents table — the
model-based corpus-quality tier above text.py's self-fit surprisals:

* ``text_stupid_backoff`` — Stupid Backoff bigram scoring (Brants et al.
  2007, "Large Language Models in Machine Translation") with a genuine
  train/score hash split, so the backoff path actually fires on unseen
  bigrams (a self-fit model never backs off — the gap the surprisal
  queries can't cover).
* ``text_good_turing`` — Good-Turing frequency-of-frequencies smoothing
  (the classic unseen-mass estimator): adjusted counts r* = (r+1)·N_{r+1}
  / N_r for the low-count head where smoothing matters.
* ``text_zipf_ols`` — Zipf power-law fit of the rank-frequency head by
  exact-integer OLS in quantized log-log space; the slope is the standard
  one-number corpus-naturalness diagnostic (natural text ≈ -1).

Exactness convention (the text.py family's): every per-term value is
quantized ONCE to integer micro/milli units (one ln per distinct term /
point), all accumulation is BIGINT, and divisions are the truncating
`div` (Spark) / `//` (DuckDB) pair, which agree including negatives.
Nothing float is ever summed.

Scale: token explosion is partition-local; every model table (unigram,
bigram vocab) is unbounded at web scale, so model joins are shuffle_hash
keyed on the token(s) — never forced broadcasts; scalar totals ride
1-row broadcasts. The Zipf head is a TakeOrderedAndProject top-k
(ZIPF_HEAD_K rows) so its rank window is bounded by construction.

Reference parity: the reference has no LM surface (closest analog is the
prefix listing in ``data_provider.py``); this family exists for the
mandated LLM-training-data quality tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .common import t

# alpha = 0.4 exactly (Brants et al.'s published constant), in micro-units
SB_ALPHA_MICRO = 400_000
# md5 first byte < 128 -> ~50% of docs train the model, the rest are scored
SB_TRAIN_LT = 128
# rank-frequency head size for the Zipf fit (top-k bounds the rank window)
ZIPF_HEAD_K = 100
# Good-Turing is only meaningful on the low-count head
GT_MAX_R = 10


def _bucket(col: F.Column) -> F.Column:
    """First md5 byte of the stable key as 0..255 (split_assign_stats
    convention, preprocess.py)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 2), 16, 10).cast("bigint")


def _bigrams(df: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) adjacent-token pairs — the arrays_zip slice pair
    (text.py bigram convention), entirely JVM-side."""
    ts = F.split(F.col("text"), " ")
    return (
        df.filter(F.size(ts) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(ts, 1, F.size(ts) - 1).alias("w1"),
                    F.slice(ts, 2, F.size(ts) - 1).alias("w2"),
                )
            ).alias("bgr"),
        )
        .select("doc_id", F.col("bgr.w1").alias("w1"), F.col("bgr.w2").alias("w2"))
    )


def text_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff bigram score of held-out documents:

        S(w2|w1) = c(w1 w2) / c(w1)          if the bigram was seen in train
                 = 0.4 * c(w2) / N           otherwise (backoff to unigram)

    fit on the ~50% md5-split train half, scored on the other half — the
    held-out design is what makes the backoff branch real (scoring the
    training corpus with itself never backs off). Per-doc output: bigram
    count, how often backoff fired, and the exact integer score mass.

    Determinism: S is quantized per OCCURRENCE via one truncating integer
    division of exact counts ((1e6*c12) div c1, or (4e5*c2) div N), so
    per-doc accumulation is pure BIGINT; c12 non-null implies c1 non-null
    (a train bigram's w1 is a train token). Unseen w2 contributes exactly
    0. Bounded: 1e6*c12 <= 1e6*N — bigint-safe through ~9e12 train tokens.

    Scale: two model tables (bigram, unigram vocab — unbounded) join
    shuffle_hash on their token keys; the train-token total N is a 1-row
    broadcast. One groupBy(doc_id) finishes it — map-side combinable."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.withColumn("b", _bucket(F.col("doc_id")))
    train = split.filter(F.col("b") < SB_TRAIN_LT).select("doc_id", "text")
    score = split.filter(F.col("b") >= SB_TRAIN_LT).select("doc_id", "text")

    c12 = _bigrams(train).groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    tr_tok = train.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cu = tr_tok.groupBy("tok").agg(F.count("*").alias("cu"))
    n_train = tr_tok.groupBy().agg(F.count("*").alias("n_train"))

    scored = (
        _bigrams(score)
        .join(c12.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(
            cu.select(F.col("tok").alias("w1"), F.col("cu").alias("c1")).hint(
                "shuffle_hash"
            ),
            "w1",
            "left",
        )
        .join(
            cu.select(F.col("tok").alias("w2"), F.col("cu").alias("c2")).hint(
                "shuffle_hash"
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(n_train))
        .select(
            "doc_id",
            F.expr(
                f"CAST(CASE WHEN c12 IS NOT NULL THEN (1000000 * c12) div c1 "
                f"ELSE ({SB_ALPHA_MICRO} * coalesce(c2, 0)) div n_train END "
                f"AS BIGINT)"
            ).alias("s_micro"),
            F.col("c12").isNull().cast("int").alias("is_backoff"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("is_backoff").cast("bigint").alias("n_backoff"),
        F.sum("s_micro").cast("bigint").alias("score_micro"),
        F.round(F.sum("s_micro").cast("double") / 1e6 / F.count("*"), 4).alias(
            "avg_score"
        ),
    )


ORACLE_STUPID_BACKOFF = f"""
WITH sb_split AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS b
  FROM documents
), sb_train AS (
  SELECT doc_id, text FROM sb_split WHERE b < {SB_TRAIN_LT}
), sb_score AS (
  SELECT doc_id, text FROM sb_split WHERE b >= {SB_TRAIN_LT}
), tr_bg AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT string_split(text, ' ') AS ts FROM sb_train),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM tr_bg GROUP BY 1, 2
), tr_tok AS (
  SELECT tok FROM (SELECT string_split(text, ' ') AS ts FROM sb_train),
       unnest(ts) AS u(tok)
), cu AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM tr_tok GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM tr_tok
), sc_bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM sb_score),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), sb_scored AS (
  SELECT s.doc_id,
         CAST(CASE WHEN c12.c12 IS NOT NULL THEN (1000000 * c12.c12) // u1.cu
              ELSE ({SB_ALPHA_MICRO} * COALESCE(u2.cu, 0)) // n.n_train END
              AS BIGINT) AS s_micro,
         CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END AS is_backoff
  FROM sc_bg s
  LEFT JOIN c12 ON s.w1 = c12.w1 AND s.w2 = c12.w2
  LEFT JOIN cu u1 ON u1.tok = s.w1
  LEFT JOIN cu u2 ON u2.tok = s.w2
  CROSS JOIN n
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(is_backoff) AS BIGINT) AS n_backoff,
       CAST(SUM(s_micro) AS BIGINT) AS score_micro,
       ROUND(CAST(SUM(s_micro) AS DOUBLE) / 1e6 / COUNT(*), 4) AS avg_score
FROM sb_scored
GROUP BY doc_id
"""


def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing smoothed counts for the low-frequency head of the
    TRIGRAM type distribution: the frequency-of-frequencies table
    N_r = |{g : c(g) = r}| and the adjusted count r* = (r+1)·N_{r+1}/N_r
    for r <= GT_MAX_R — the classic estimator of the probability mass the
    corpus hides in rare/unseen types (r=1's N_1/N is the standard
    unseen-mass estimate; r* is what a Katz-backoff LM substitutes for
    raw counts). Trigrams are where smoothing matters: the unigram
    distribution of any real corpus has no count-1..10 head worth
    smoothing, the trigram type space is sparse at every corpus size.

    Determinism: r* is one truncating integer division of exact BIGINTs
    ((1e6·(r+1)·N_{r+1}) div N_r); everything else is counts.

    Scale: two cascaded map-side-combinable groupBys (trigram -> count,
    count -> N_r); the first is the only row-multiplying step (explode is
    partition-local), the second's output is at most |distinct counts|
    rows — tiny. The r+1 self-join runs on that tiny frame."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.split(F.col("text"), " ")
    grams = docs.filter(F.size(ts) >= 3).select(
        F.explode(
            F.arrays_zip(
                F.slice(ts, 1, F.size(ts) - 2).alias("w1"),
                F.slice(ts, 2, F.size(ts) - 2).alias("w2"),
                F.slice(ts, 3, F.size(ts) - 2).alias("w3"),
            )
        ).alias("g")
    ).select(F.concat_ws(" ", "g.w1", "g.w2", "g.w3").alias("gram"))
    cw = grams.groupBy("gram").agg(F.count("*").alias("c"))
    ff = cw.groupBy("c").agg(F.count("*").alias("n_r")).select(
        F.col("c").alias("r"), "n_r"
    )
    nxt = ff.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    return (
        ff.join(nxt, "r", "left")
        .filter(F.col("r") <= GT_MAX_R)
        .select(
            "r",
            "n_r",
            F.coalesce("n_r_next", F.lit(0)).cast("bigint").alias("n_r_next"),
            F.expr(
                "CAST((1000000 * (r + 1) * coalesce(n_r_next, 0)) div n_r AS BIGINT)"
            ).alias("rstar_micro"),
        )
    )


ORACLE_GOOD_TURING = f"""
WITH gt_grams AS (
  SELECT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
  FROM (SELECT string_split(text, ' ') AS ts FROM documents),
       unnest(range(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 3
), gt_cw AS (
  SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM gt_grams GROUP BY 1
), gt_ff AS (
  SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM gt_cw GROUP BY 1
)
SELECT f.r, f.n_r,
       CAST(COALESCE(g.n_r, 0) AS BIGINT) AS n_r_next,
       CAST((1000000 * (f.r + 1) * COALESCE(g.n_r, 0)) // f.n_r AS BIGINT)
         AS rstar_micro
FROM gt_ff f LEFT JOIN gt_ff g ON g.r = f.r + 1
WHERE f.r <= {GT_MAX_R}
"""


def text_zipf_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the token rank-frequency head: OLS of
    ln(count) on ln(rank) over the top-ZIPF_HEAD_K tokens. Natural text
    lands near slope -1; a flat slope flags templated/duplicated corpora,
    a cliff flags a degenerate vocabulary — the one-number diagnostic run
    before committing a crawl snapshot to training.

    Determinism: each head point is quantized ONCE to integer MILLI-NATS
    (round(ln·1e3)); the five OLS sums are exact BIGINT; slope and
    intercept come out through the truncating div pair (negative-safe —
    the slope numerator is negative by construction). Magnitudes: |x|<=
    ln(k)·1e3, |y|<=ln(N)·1e3 (~3.5e4 at 1e15 tokens), so k·Σxy·1e6 stays
    under 2^63 at any conceivable corpus size.

    Scale: one map-side-combinable token count, then a
    TakeOrderedAndProject top-k ((count desc, token) unique tie-break) —
    the rank window runs over exactly ZIPF_HEAD_K rows by construction,
    never an unbounded global window."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cw = toks.groupBy("tok").agg(F.count("*").alias("c"))
    head = cw.orderBy(F.col("c").desc(), F.col("tok")).limit(ZIPF_HEAD_K)
    # window input is the k-row head — bounded by the LIMIT above
    rank_w = W.orderBy(F.col("c").desc(), F.col("tok"))
    pts = head.select(
        F.row_number().over(rank_w).alias("rank"), F.col("c")
    ).select(
        F.expr("CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1000) AS BIGINT)").alias(
            "x_milli"
        ),
        F.expr("CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT)").alias("y_milli"),
    )
    agg = pts.agg(
        F.count("*").alias("k"),
        F.sum("x_milli").alias("sx"),
        F.sum("y_milli").alias("sy"),
        F.sum(F.col("x_milli") * F.col("x_milli")).alias("sxx"),
        F.sum(F.col("x_milli") * F.col("y_milli")).alias("sxy"),
    )
    return agg.select(
        F.col("k").cast("bigint").alias("k"),
        F.expr(
            "CAST((1000000 * (k * sxy - sx * sy)) div (k * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_micro"),
        F.expr(
            "CAST((sy - ((1000000 * (k * sxy - sx * sy)) div (k * sxx - sx * sx))"
            " * sx div 1000000) div k AS BIGINT)"
        ).alias("intercept_milli"),
        F.expr(
            "ROUND(CAST((1000000 * (k * sxy - sx * sy)) div (k * sxx - sx * sx)"
            " AS DOUBLE) / 1e6, 4)"
        ).alias("slope"),
    )


ORACLE_ZIPF = f"""
WITH zf_toks AS (
  SELECT tok FROM (SELECT string_split(text, ' ') AS ts FROM documents),
       unnest(ts) AS u(tok)
), zf_cw AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM zf_toks GROUP BY 1
), zf_head AS (
  SELECT tok, c FROM zf_cw ORDER BY c DESC, tok LIMIT {ZIPF_HEAD_K}
), zf_pts AS (
  SELECT CAST(ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS DOUBLE))
              * 1000) AS BIGINT) AS x_milli,
         CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y_milli
  FROM zf_head
), zf_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x_milli) AS BIGINT) AS sx,
         CAST(SUM(y_milli) AS BIGINT) AS sy,
         CAST(SUM(x_milli * x_milli) AS BIGINT) AS sxx,
         CAST(SUM(x_milli * y_milli) AS BIGINT) AS sxy
  FROM zf_pts
)
SELECT k,
       CAST((1000000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx) AS BIGINT)
         AS slope_micro,
       CAST((sy - ((1000000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx))
             * sx // 1000000) // k AS BIGINT) AS intercept_milli,
       ROUND(CAST((1000000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx)
             AS DOUBLE) / 1e6, 4) AS slope
FROM zf_agg
"""


QUERIES: dict[str, tuple] = {
    "text_stupid_backoff": (text_stupid_backoff, ORACLE_STUPID_BACKOFF),
    "text_good_turing": (text_good_turing, ORACLE_GOOD_TURING),
    "text_zipf_ols": (text_zipf_ols, ORACLE_ZIPF),
}


HEAPS_BUCKETS = 10


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ≈ K·n^β estimated by OLS
    in quantized log-log space over the cumulative (tokens seen, distinct
    types seen) curve sampled at HEAPS_BUCKETS ingest-order deciles.
    Natural text lands β ≈ 0.4–0.6; a collapsing β flags a closed/
    templated vocabulary (this synthetic corpus's tiny vocab reads near
    0 — the fit machinery is the deliverable, the corpus proves nothing).
    The vocabulary-budget companion to text_zipf_ols: Zipf reads the
    head, Heaps predicts how the tail GROWS with more data.

    Determinism: type first-seen is min(doc_id) (order-free, the novelty
    convention); deciles are the closed-form bucket; cumulative sums run
    over the HEAPS_BUCKETS-row rollup (bounded window); each curve point
    quantizes ONCE to milli-nats; the OLS is the zipf exact-integer
    spelling (negative-safe truncating div pair).

    Scale: one token explode feeding two map-side-combinable aggregates
    (per-decile token counts; per-type min doc then per-decile type
    counts); everything after is HEAPS_BUCKETS rows."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.groupBy().agg(F.max("doc_id").alias("max_id"))
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    bucketed = toks.crossJoin(F.broadcast(max_id)).withColumn(
        "b",
        F.expr(f"CAST((doc_id * {HEAPS_BUCKETS}) div (max_id + 1) AS BIGINT)"),
    )
    tok_per_b = bucketed.groupBy("b").agg(F.count("*").alias("n_toks"))
    first_seen = bucketed.groupBy("tok").agg(F.min("b").alias("b"))
    new_per_b = first_seen.groupBy("b").agg(F.count("*").alias("n_new"))
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)  # bounded: <= 10 rows
    curve = (
        tok_per_b.join(new_per_b, "b", "left")
        .select("b", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .select(
            "b",
            F.sum("n_toks").over(wb).alias("cum_toks"),
            F.sum("n_new").over(wb).alias("cum_types"),
        )
    )
    pts = curve.select(
        F.expr("CAST(ROUND(ln(CAST(cum_toks AS DOUBLE)) * 1000) AS BIGINT)").alias(
            "x_milli"
        ),
        F.expr("CAST(ROUND(ln(CAST(cum_types AS DOUBLE)) * 1000) AS BIGINT)").alias(
            "y_milli"
        ),
    )
    agg = pts.agg(
        F.count("*").alias("k"),
        F.sum("x_milli").alias("sx"),
        F.sum("y_milli").alias("sy"),
        F.sum(F.col("x_milli") * F.col("x_milli")).alias("sxx"),
        F.sum(F.col("x_milli") * F.col("y_milli")).alias("sxy"),
    )
    return agg.select(
        F.col("k").cast("bigint").alias("k"),
        F.expr(
            "CAST((1000000 * (k * sxy - sx * sy)) div (k * sxx - sx * sx) AS BIGINT)"
        ).alias("beta_micro"),
        F.expr(
            "CAST((sy - ((1000000 * (k * sxy - sx * sy)) div (k * sxx - sx * sx))"
            " * sx div 1000000) div k AS BIGINT)"
        ).alias("logk_milli"),
    )


ORACLE_HEAPS = f"""
WITH hp_max AS (
  SELECT MAX(doc_id) AS max_id FROM documents
), hp_toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(ts) AS u(tok)
), hp_bucketed AS (
  SELECT CAST((t.doc_id * {HEAPS_BUCKETS}) // (m.max_id + 1) AS BIGINT) AS b, t.tok
  FROM hp_toks t CROSS JOIN hp_max m
), hp_tok_per_b AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_toks FROM hp_bucketed GROUP BY 1
), hp_new_per_b AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM (SELECT tok, MIN(b) AS b FROM hp_bucketed GROUP BY 1) GROUP BY 1
), hp_curve AS (
  SELECT t.b,
         SUM(t.n_toks) OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING) AS cum_toks,
         SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY t.b ROWS UNBOUNDED PRECEDING)
           AS cum_types
  FROM hp_tok_per_b t LEFT JOIN hp_new_per_b n USING (b)
), hp_pts AS (
  SELECT CAST(ROUND(ln(CAST(cum_toks AS DOUBLE)) * 1000) AS BIGINT) AS x_milli,
         CAST(ROUND(ln(CAST(cum_types AS DOUBLE)) * 1000) AS BIGINT) AS y_milli
  FROM hp_curve
), hp_agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x_milli) AS BIGINT) AS sx, CAST(SUM(y_milli) AS BIGINT) AS sy,
         CAST(SUM(x_milli * x_milli) AS BIGINT) AS sxx,
         CAST(SUM(x_milli * y_milli) AS BIGINT) AS sxy
  FROM hp_pts
)
SELECT k,
       CAST((1000000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx) AS BIGINT)
         AS beta_micro,
       CAST((sy - ((1000000 * (k * sxy - sx * sy)) // (k * sxx - sx * sx))
             * sx // 1000000) // k AS BIGINT) AS logk_milli
FROM hp_agg
"""


QUERIES["text_heaps_law"] = (text_heaps_law, ORACLE_HEAPS)


# ---------------------------------------------------------------------------
# Per-document perplexity quality filter: the CCNet deployment shape
# (Wenzek et al. 2020 — score every crawled doc under an LM trained on
# trusted text, keep the low-perplexity fraction), realized with a
# Laplace-smoothed bigram LM so every probability is a ratio of exact
# integers and the whole chain stays value-provable (a Kneser-Ney/KenLM
# model would be rows-only; this is the same-shape exact stand-in).

PPL_BAR_MICRO = 3_450_000  # keep bar near the corpus median avg NLL, so the
# decision column genuinely splits the corpus (a bar no doc crosses would
# prove only the arithmetic, not the branch)


def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out per-document cross-entropy under a Laplace bigram LM fit
    on the md5-split train half (the text_stupid_backoff split):

        nll(w2|w1) = ln((c1 + V) / (c12 + 1))     seen history w1
                   = ln((N + V) / (c2 + 1))       unseen history (unigram)

    with V = train vocab size, N = train tokens. Per scored doc: bigram
    count, total NLL (micro-nats), average NLL per bigram, and the
    curation decision avg < PPL_BAR_MICRO — exactly the CCNet keep/drop
    axis, here against a fixed literal bar so the decision is replayable.

    Determinism: one ln per scored bigram quantized to micro-nats
    (half-away ROUND in both engines), BIGINT accumulation, truncating
    div for the per-doc average. Laplace +1 keeps every argument ratio
    of positive exact integers.

    Scale: the same two shuffle_hash model joins as text_stupid_backoff
    (model tables are vocabulary-sized — never broadcast); V and N are
    1-row broadcasts; one map-side-combinable groupBy(doc_id) ends it."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    split = docs.withColumn("b", _bucket(F.col("doc_id")))
    train = split.filter(F.col("b") < SB_TRAIN_LT).select("doc_id", "text")
    score = split.filter(F.col("b") >= SB_TRAIN_LT).select("doc_id", "text")

    c12 = _bigrams(train).groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    tr_tok = train.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cu = tr_tok.groupBy("tok").agg(F.count("*").alias("cu"))
    totals = tr_tok.groupBy().agg(
        F.count("*").alias("n_train"), F.countDistinct("tok").alias("v_train")
    )

    scored = (
        _bigrams(score)
        .join(c12.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(
            cu.select(F.col("tok").alias("w1"), F.col("cu").alias("c1")).hint(
                "shuffle_hash"
            ),
            "w1",
            "left",
        )
        .join(
            cu.select(F.col("tok").alias("w2"), F.col("cu").alias("c2")).hint(
                "shuffle_hash"
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.expr(
                "CAST(ROUND(ln(CASE WHEN c1 IS NOT NULL THEN"
                " CAST(c1 + v_train AS DOUBLE) / CAST(coalesce(c12, 0) + 1 AS DOUBLE)"
                " ELSE CAST(n_train + v_train AS DOUBLE) / CAST(coalesce(c2, 0) + 1 AS DOUBLE)"
                " END) * 1e6) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("nll_micro").cast("bigint").alias("h_micro"),
        F.expr("CAST(SUM(nll_micro) div COUNT(*) AS BIGINT)").alias(
            "avg_nll_micro"
        ),
        F.expr(f"CAST(SUM(nll_micro) div COUNT(*) < {PPL_BAR_MICRO} AS BOOLEAN)").alias(
            "keep"
        ),
    )


_SQL_PPL_SCORED = f"""
pp_split AS (
  SELECT doc_id, text,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS b
  FROM documents
), pp_train AS (
  SELECT doc_id, text FROM pp_split WHERE b < {SB_TRAIN_LT}
), pp_score AS (
  SELECT doc_id, text FROM pp_split WHERE b >= {SB_TRAIN_LT}
), pp_tr_bg AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT string_split(text, ' ') AS ts FROM pp_train),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), pp_c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM pp_tr_bg GROUP BY 1, 2
), pp_tr_tok AS (
  SELECT tok FROM (SELECT string_split(text, ' ') AS ts FROM pp_train),
       unnest(ts) AS u(tok)
), pp_cu AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM pp_tr_tok GROUP BY 1
), pp_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS v_train
  FROM pp_tr_tok
), pp_sc_bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM pp_score),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), pp_scored AS (
  SELECT s.doc_id,
         CAST(ROUND(ln(CASE WHEN u1.cu IS NOT NULL THEN
                CAST(u1.cu + t.v_train AS DOUBLE)
                / CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
              ELSE CAST(t.n_train + t.v_train AS DOUBLE)
                / CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE)
              END) * 1e6) AS BIGINT) AS nll_micro
  FROM pp_sc_bg s
  LEFT JOIN pp_c12 c12 ON s.w1 = c12.w1 AND s.w2 = c12.w2
  LEFT JOIN pp_cu u1 ON u1.tok = s.w1
  LEFT JOIN pp_cu u2 ON u2.tok = s.w2
  CROSS JOIN pp_tot t
)
"""

ORACLE_PPL_FILTER = f"""
WITH {_SQL_PPL_SCORED}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_micro) AS BIGINT) AS h_micro,
       CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS avg_nll_micro,
       (SUM(nll_micro) // COUNT(*) < {PPL_BAR_MICRO}) AS keep
FROM pp_scored
GROUP BY doc_id
"""


def text_perplexity_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation readout over the per-doc filter: per source, scored
    docs, keep rate (milli), and the mean of the per-doc average NLLs —
    the table a corpus owner reads to tune PPL_BAR_MICRO per domain (the
    CCNet paper's per-language threshold tables have this shape)."""
    per_doc = text_perplexity_filter(spark, sf_dir)
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).cast("bigint").alias("n_keep"),
            F.expr("CAST((1000 * SUM(CAST(keep AS BIGINT))) div COUNT(*) AS BIGINT)").alias(
                "keep_rate_milli"
            ),
            F.expr("CAST(SUM(avg_nll_micro) div COUNT(*) AS BIGINT)").alias(
                "mean_avg_nll_micro"
            ),
        )
    )


ORACLE_PPL_SOURCE = f"""
WITH {_SQL_PPL_SCORED},
pp_doc AS (
  SELECT doc_id,
         CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS avg_nll_micro,
         (SUM(nll_micro) // COUNT(*) < {PPL_BAR_MICRO}) AS keep
  FROM pp_scored
  GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN p.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST((1000 * SUM(CASE WHEN p.keep THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS keep_rate_milli,
       CAST(SUM(p.avg_nll_micro) // COUNT(*) AS BIGINT) AS mean_avg_nll_micro
FROM pp_doc p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


QUERIES["text_perplexity_filter"] = (text_perplexity_filter, ORACLE_PPL_FILTER)
QUERIES["text_perplexity_source_report"] = (
    text_perplexity_source_report,
    ORACLE_PPL_SOURCE,
)


# ---------------------------------------------------------------------------
# Data valuation: per-source leave-one-out influence on held-out LM loss
# (the exact-LOO member of the Data Shapley family, Ghorbani & Zou 2019 —
# "what does each data source contribute to model quality?"). Because the
# Laplace bigram LM is a pure count table, the model trained WITHOUT
# source s is computable in closed form (count subtraction), so the LOO
# retrain — normally the prohibitive part of data valuation — is one
# grouped aggregate, and the whole valuation is SQL-provable.


def docs_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each source s: held-out corpus NLL under the LM trained on all
    train docs EXCEPT source s, vs under the full train LM. influence =
    nll_loo - nll_full (positive: removing s hurts the model, so s was
    contributing useful signal; negative: s was noise). The per-row LOO
    arithmetic subtracts source-s counts from the full tables:

        c12_loo = c12 - c12_s ; c1_loo = c1 - c1_s ; N_loo = N - N_s
        V_loo   = |{t : cu_t > cu_{t,s}}|  (types surviving the removal)

    and applies text_perplexity_filter's exact Laplace expression, taking
    the unigram-fallback branch when the history w1 vanishes with s.

    Determinism: one ln per (scored bigram, source) row quantized to
    micro-nats, BIGINT sums. nll_full is recomputed in the same rows and
    emitted per source as a cross-check column (identical for every s by
    construction — a value-level canary for the join fan-out).

    Scale/plan shape (r11 rework, guide §3.3 "explode before a join
    multiplies the shuffle" + §2.3 "aggregate before you shuffle"): the
    model joins run on DISTINCT held-out bigrams with their multiplicity
    m (the held-out eval set is the small side at production scale —
    CCNet-style valuation scores a fixed eval corpus, not the crawl);
    per-source counts ride along as source->count maps collected per
    bigram key, so the |bigrams| x |sources| explosion happens AFTER all
    shuffled joins, as a broadcast cross join + map lookups with no
    further exchange before the final source rollup. The global count
    tables derive from the per-source ones (sum over sources), so the
    train corpus is exploded exactly twice (bigram pass + token pass),
    localCheckpoint-pinned so no consumer re-derives them. Sums weighted
    by m are the identical BIGINT totals of the old per-instance frame."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    split = docs.withColumn("b", _bucket(F.col("doc_id")))
    train = split.filter(F.col("b") < SB_TRAIN_LT).select("source", "text")
    score = split.filter(F.col("b") >= SB_TRAIN_LT).select("doc_id", "text")

    tr_bg = (
        train.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select(
            "source",
            F.explode(
                F.arrays_zip(
                    F.slice(F.split(F.col("text"), " "), 1, F.size(F.split(F.col("text"), " ")) - 1).alias("w1"),
                    F.slice(F.split(F.col("text"), " "), 2, F.size(F.split(F.col("text"), " ")) - 1).alias("w2"),
                )
            ).alias("bgr"),
        )
        .select("source", F.col("bgr.w1").alias("w1"), F.col("bgr.w2").alias("w2"))
    )
    # one corpus pass per n-gram order; every other table derives from these
    c12_s = (
        tr_bg.groupBy("source", "w1", "w2")
        .agg(F.count("*").alias("c12_s"))
        .localCheckpoint(eager=False)
    )
    cu_s = (
        train.select("source", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cu_s"))
        .localCheckpoint(eager=False)
    )
    c12 = c12_s.groupBy("w1", "w2").agg(F.sum("c12_s").alias("c12"))
    cu = cu_s.groupBy("tok").agg(F.sum("cu_s").alias("cu")).localCheckpoint(eager=False)
    # per-source scalars: train tokens removed with s, and surviving vocab
    per_src = (
        cu_s.join(cu, "tok")
        .groupBy("source")
        .agg(
            F.sum("cu_s").cast("bigint").alias("n_s"),
            F.sum(F.when(F.col("cu") > F.col("cu_s"), 0).otherwise(1))
            .cast("bigint")
            .alias("v_lost"),
        )
    )
    totals = cu.groupBy().agg(
        F.sum("cu").alias("n_train"), F.count("*").alias("v_train")
    )
    sources = docs.select("source").distinct()

    # distinct score bigrams with multiplicity: the shuffled joins below
    # never see the x|sources| fan-out, and repeated bigrams join once
    sc_bg = _bigrams(score).select("w1", "w2").groupBy("w1", "w2").agg(
        F.count("*").alias("m")
    )
    c12s_map = c12_s.groupBy("w1", "w2").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "c12_s"))).alias("c12s_map")
    )
    cus_map = cu_s.groupBy("tok").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "cu_s"))).alias("cus_map")
    )
    base = (
        sc_bg.join(c12.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(c12s_map.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(
            cu.select(F.col("tok").alias("w1"), F.col("cu").alias("c1")).hint("shuffle_hash"),
            "w1",
            "left",
        )
        .join(
            cus_map.select(F.col("tok").alias("w1"), F.col("cus_map").alias("c1s_map")).hint(
                "shuffle_hash"
            ),
            "w1",
            "left",
        )
        .join(
            cu.select(F.col("tok").alias("w2"), F.col("cu").alias("c2")).hint("shuffle_hash"),
            "w2",
            "left",
        )
        .join(
            cus_map.select(F.col("tok").alias("w2"), F.col("cus_map").alias("c2s_map")).hint(
                "shuffle_hash"
            ),
            "w2",
            "left",
        )
    )
    exploded = (
        base.crossJoin(F.broadcast(sources))
        .join(F.broadcast(per_src), "source", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("c12_s", F.element_at("c12s_map", F.col("source")))
        .withColumn("c1_s", F.element_at("c1s_map", F.col("source")))
        .withColumn("c2_s", F.element_at("c2s_map", F.col("source")))
    )
    nll = exploded.select(
        "source",
        "m",
        F.expr(
            "CAST(ROUND(ln(CASE WHEN c1 IS NOT NULL THEN"
            " CAST(c1 + v_train AS DOUBLE) / CAST(coalesce(c12, 0) + 1 AS DOUBLE)"
            " ELSE CAST(n_train + v_train AS DOUBLE) / CAST(coalesce(c2, 0) + 1 AS DOUBLE)"
            " END) * 1e6) AS BIGINT)"
        ).alias("nll_full_micro"),
        F.expr(
            "CAST(ROUND(ln(CASE WHEN coalesce(c1, 0) - coalesce(c1_s, 0) > 0 THEN"
            " CAST((coalesce(c1, 0) - coalesce(c1_s, 0))"
            "      + (v_train - coalesce(v_lost, 0)) AS DOUBLE)"
            " / CAST((coalesce(c12, 0) - coalesce(c12_s, 0)) + 1 AS DOUBLE)"
            " ELSE CAST((n_train - coalesce(n_s, 0))"
            "           + (v_train - coalesce(v_lost, 0)) AS DOUBLE)"
            " / CAST((coalesce(c2, 0) - coalesce(c2_s, 0)) + 1 AS DOUBLE)"
            " END) * 1e6) AS BIGINT)"
        ).alias("nll_loo_micro"),
    )
    return (
        nll.groupBy("source")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("nll_full_micro") * F.col("m")).cast("bigint").alias("nll_full_micro"),
            F.sum(F.col("nll_loo_micro") * F.col("m")).cast("bigint").alias("nll_loo_micro"),
            (
                F.sum(F.col("nll_loo_micro") * F.col("m"))
                - F.sum(F.col("nll_full_micro") * F.col("m"))
            )
            .cast("bigint")
            .alias("influence_micro"),
        )
        .select(
            "source",
            "n_bigrams",
            "nll_full_micro",
            "nll_loo_micro",
            "influence_micro",
            F.expr("CAST((1000 * influence_micro) div n_bigrams AS BIGINT)").alias(
                "influence_milli_per_kbigram"
            ),
        )
    )


ORACLE_SOURCE_INFLUENCE = f"""
WITH si_split AS (
  SELECT doc_id, source, text,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS b
  FROM documents
), si_train AS (
  SELECT source, text FROM si_split WHERE b < {SB_TRAIN_LT}
), si_score AS (
  SELECT doc_id, text FROM si_split WHERE b >= {SB_TRAIN_LT}
), si_tr_bg AS (
  SELECT source, ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT source, string_split(text, ' ') AS ts FROM si_train),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), si_c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM si_tr_bg GROUP BY 1, 2
), si_c12_s AS (
  SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12_s
  FROM si_tr_bg GROUP BY 1, 2, 3
), si_tr_tok AS (
  SELECT source, tok
  FROM (SELECT source, string_split(text, ' ') AS ts FROM si_train),
       unnest(ts) AS u(tok)
), si_cu AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM si_tr_tok GROUP BY 1
), si_cu_s AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cu_s FROM si_tr_tok GROUP BY 1, 2
), si_per_src AS (
  SELECT s.source,
         CAST(SUM(s.cu_s) AS BIGINT) AS n_s,
         CAST(SUM(CASE WHEN c.cu > s.cu_s THEN 0 ELSE 1 END) AS BIGINT) AS v_lost
  FROM si_cu_s s JOIN si_cu c USING (tok)
  GROUP BY 1
), si_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS v_train
  FROM si_tr_tok
), si_sources AS (
  SELECT DISTINCT source FROM documents
), si_sc_bg AS (
  SELECT ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT string_split(text, ' ') AS ts FROM si_score),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), si_nll AS (
  SELECT x.source,
         CAST(ROUND(ln(CASE WHEN u1.cu IS NOT NULL THEN
                CAST(u1.cu + t.v_train AS DOUBLE)
                / CAST(COALESCE(c.c12, 0) + 1 AS DOUBLE)
              ELSE CAST(t.n_train + t.v_train AS DOUBLE)
                / CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE)
              END) * 1e6) AS BIGINT) AS nll_full_micro,
         CAST(ROUND(ln(CASE WHEN COALESCE(u1.cu, 0) - COALESCE(s1.cu_s, 0) > 0 THEN
                CAST((COALESCE(u1.cu, 0) - COALESCE(s1.cu_s, 0))
                     + (t.v_train - COALESCE(p.v_lost, 0)) AS DOUBLE)
                / CAST((COALESCE(c.c12, 0) - COALESCE(cs.c12_s, 0)) + 1 AS DOUBLE)
              ELSE CAST((t.n_train - COALESCE(p.n_s, 0))
                        + (t.v_train - COALESCE(p.v_lost, 0)) AS DOUBLE)
                / CAST((COALESCE(u2.cu, 0) - COALESCE(s2.cu_s, 0)) + 1 AS DOUBLE)
              END) * 1e6) AS BIGINT) AS nll_loo_micro
  FROM (SELECT b.w1, b.w2, src.source FROM si_sc_bg b CROSS JOIN si_sources src) x
  LEFT JOIN si_c12 c ON c.w1 = x.w1 AND c.w2 = x.w2
  LEFT JOIN si_c12_s cs ON cs.source = x.source AND cs.w1 = x.w1 AND cs.w2 = x.w2
  LEFT JOIN si_cu u1 ON u1.tok = x.w1
  LEFT JOIN si_cu_s s1 ON s1.source = x.source AND s1.tok = x.w1
  LEFT JOIN si_cu u2 ON u2.tok = x.w2
  LEFT JOIN si_cu_s s2 ON s2.source = x.source AND s2.tok = x.w2
  LEFT JOIN si_per_src p ON p.source = x.source
  CROSS JOIN si_tot t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_full_micro) AS BIGINT) AS nll_full_micro,
       CAST(SUM(nll_loo_micro) AS BIGINT) AS nll_loo_micro,
       CAST(SUM(nll_loo_micro) - SUM(nll_full_micro) AS BIGINT) AS influence_micro,
       CAST((1000 * (SUM(nll_loo_micro) - SUM(nll_full_micro))) // COUNT(*) AS BIGINT)
         AS influence_milli_per_kbigram
FROM si_nll
GROUP BY source
"""


QUERIES["docs_source_influence"] = (docs_source_influence, ORACLE_SOURCE_INFLUENCE)
