"""Text-analysis operators over the documents table — the LLM-data-pipeline
surface (north star): quality scoring, token statistics, language-ID
scaffolding, fingerprinting. All pure pyspark.sql.functions (JVM-side,
whole-stage codegen); no Python UDFs in this family.

Determinism: ratios are single IEEE divisions of exact integer counts;
every top-k carries a unique tie-break.

Scale notes: token explosion is the only row-multiplying step (~n_tokens x
docs); aggregations after it are map-side combinable. At 100 TB the explode
happens partition-local with no shuffle before the partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t

STOPWORDS = ["a", "the", "of", "and"]  # intersects the synthetic vocab at 'a'/'the'
_SW_SQL = "('" + "', '".join(STOPWORDS) + "')"


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, type-token ratio, stopword
    ratio, average token length — the standard cheap quality filters applied
    before expensive LLM training steps."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n_tokens.cast("double")).alias("type_token_ratio"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        # single-space-joined text: total token chars = len - (n_tokens - 1)
        ((F.length("text") - n_tokens + 1).cast("double") / n_tokens.cast("double")).alias(
            "avg_token_len"
        ),
    )


ORACLE_QUALITY = f"""
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS type_token_ratio,
       CAST(len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL})) AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
FROM documents
"""


def text_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language and source: the dataset-curation
    dashboard query (doc counts, volume, token totals)."""
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("bigint")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_tokens).alias("total_tokens"),
        (F.sum(n_tokens).cast("double") / F.count("*").cast("double")).alias(
            "avg_tokens_per_doc"
        ),
    )


ORACLE_CORPUS_ROLLUP = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_tokens_per_doc
FROM documents
GROUP BY 1, 2
"""


def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-20 (explode -> count -> TakeOrdered):
    vocabulary analysis / BPE-merge-candidate shape."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


ORACLE_TOKEN_TOPK = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


def text_langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: build per-language token profiles (top-5 tokens
    by frequency over a deterministic training split), score every doc by
    profile overlap, argmax with total-order tie-breaks. On this synthetic
    corpus the vocabulary is shared across languages, so accuracy is near
    chance — the operator demonstrates the distributed profile-scoring
    pipeline (train split -> profile -> broadcast -> score -> argmax)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(_tokens()).alias("token"))
    train = tok.filter(F.col("doc_id") % 2 == 0)
    prof_w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    profiles = (
        train.groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(prof_w))
        .filter(F.col("rk") <= 5)
        .select(F.col("lang").alias("profile_lang"), "token")
    )
    doc_tokens = docs.select("doc_id", "lang", F.explode(F.array_distinct(_tokens())).alias("token"))
    scores = (
        doc_tokens.join(F.broadcast(profiles), "token")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count("*").alias("overlap"))
    )
    pick_w = W.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("profile_lang"))
    return (
        scores.withColumn("rk", F.row_number().over(pick_w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("profile_lang").alias("predicted_lang"),
            F.col("overlap").alias("score"),
            (F.col("lang") == F.col("profile_lang")).alias("correct"),
        )
    )


ORACLE_LANGID = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
), profiles AS (
  SELECT lang AS profile_lang, token FROM (
    SELECT lang, token, COUNT(*) AS n,
           row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, token) AS rk
    FROM tok WHERE doc_id % 2 = 0
    GROUP BY lang, token
  ) WHERE rk <= 5
), doc_tokens AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), scores AS (
  SELECT d.doc_id, d.lang, p.profile_lang, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM doc_tokens d JOIN profiles p USING (token)
  GROUP BY 1, 2, 3
)
SELECT doc_id, lang, profile_lang AS predicted_lang, overlap AS score,
       lang = profile_lang AS correct
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY overlap DESC, profile_lang) AS rk
  FROM scores
) WHERE rk = 1
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash (md5) and an order-insensitive
    bag-of-words hash — the keys used by exact/normalized dedup."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.md5(F.col("text")), 1, 16).alias("content_fp"),
        F.substring(
            F.md5(F.array_join(F.array_sort(F.split(F.col("text"), " ")), " ")), 1, 16
        ).alias("bag_fp"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id,
       substr(md5(text), 1, 16) AS content_fp,
       substr(md5(list_aggregate(list_sort(string_split(text, ' ')), 'string_agg', ' ')), 1, 16)
         AS bag_fp
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "text_quality_stats": (text_quality_stats, ORACLE_QUALITY),
    "text_corpus_rollup": (text_corpus_rollup, ORACLE_CORPUS_ROLLUP),
    "text_token_topk": (text_token_topk, ORACLE_TOKEN_TOPK),
    "text_langid_predict": (text_langid_predict, ORACLE_LANGID),
    "text_fingerprint": (text_fingerprint, ORACLE_FINGERPRINT),
}


def text_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace + BPE-ish: whitespace tokens plus a
    subword estimate that chunks each word into <=4-char pieces (the
    ceil(len/4) approximation of byte-pair tokenizer output length) and a
    chars-per-token ratio — the budget numbers an LLM-data pipeline tracks."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_subwords = F.aggregate(
        F.transform(toks, lambda x: F.ceil(F.length(x) / 4.0)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_ws_tokens"),
        n_subwords.alias("n_subword_est"),
        (F.length("text").cast("double") / n_subwords.cast("double")).alias(
            "chars_per_subword"
        ),
    )


ORACLE_TOKEN_ESTIMATES = """
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '),
                                    x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))
            AS BIGINT) AS n_subword_est,
       CAST(length(text) AS DOUBLE)
         / CAST(list_sum(list_transform(string_split(text, ' '),
                         x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS DOUBLE)
         AS chars_per_subword
FROM documents
"""


def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing): hash every 8-char
    k-gram, take the lexicographic minimum per window of 4 consecutive
    positions — the classic plagiarism/near-dup fingerprint set, fully
    JVM-side (sequence -> transform -> explode -> min per bucket)."""
    docs = t(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    K, WIN = 8, 4
    positions = F.sequence(F.lit(1), F.length("text") - (K - 1))
    kgrams = docs.filter(F.length("text") >= K).repartition(n_part, "doc_id").select(
        "doc_id",
        F.posexplode(
            F.transform(positions, lambda i: F.md5(F.col("text").substr(i, F.lit(K))))
        ).alias("pos", "khash"),
    )
    winnowed = (
        # integer division: DuckDB's CAST(double AS INT) rounds to nearest
        # while Spark's truncates — pos DIV 4 and pos // 4 agree exactly
        kgrams.withColumn("bucket", F.expr(f"pos DIV {WIN}").cast("int"))
        .groupBy("doc_id", "bucket")
        .agg(F.min("khash").alias("fp"))
    )
    return winnowed.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
    )


ORACLE_WINNOW = """
WITH kgrams AS (
  SELECT doc_id, u.i - 1 AS pos, md5(substr(text, u.i, 8)) AS khash
  FROM documents, unnest(range(1, length(text) - 6)) AS u(i)
  WHERE length(text) >= 8
), winnowed AS (
  SELECT doc_id, CAST(pos // 4 AS INT) AS bucket, MIN(khash) AS fp
  FROM kgrams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
       MIN(fp) AS min_fp
FROM winnowed GROUP BY doc_id
"""


QUERIES.update(
    {
        "text_token_estimates": (text_token_estimates, ORACLE_TOKEN_ESTIMATES),
        "text_winnow_fingerprints": (text_winnow_fingerprints, ORACLE_WINNOW),
    }
)


def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (perplexity proxy): fit a unigram model on
    the corpus itself (token count / corpus total), then score each document
    by its total and average surprisal -ln p(tok). High average surprisal =
    statistically unusual text — the model-based quality filter that sits
    one step above the rule-based stats in text_quality_stats.

    Scale: the model is one explode->groupBy over tokens (map-side partial
    aggregation collapses hot tokens before the shuffle, so stopwords
    can't skew it). The VOCABULARY is unbounded at web scale (10^8+ terms
    with ngrams), so the scoring join is a shuffle_hash join on token —
    never a forced broadcast that ignores size; AQE's skew-join splitting
    handles stopword-hot probe partitions. The corpus total rides in as a
    broadcast scalar (cross-join of a 1-row aggregate).

    Determinism: per-token surprisal is quantized to integer MICRO-NATS
    (round(ln(c/N) * 1e6)) — one ln per distinct token — so the per-doc
    accumulation is exact BIGINT arithmetic; the average is a single IEEE
    division of exact integers. Cross-engine float summation order never
    matters because nothing float is ever summed.

    Plan shape (r11, guide §2.3 "aggregate before you shuffle"): the
    corpus is exploded ONCE into per-(doc, tok) counts (map-side partial
    aggregation collapses repeated tokens before any exchange;
    localCheckpoint pins the pass so model and scoring share it). The
    model and the corpus total both derive from that table, and the
    scoring join probes with distinct (doc, tok) pairs instead of every
    token instance — sums weighted by cnt are the identical BIGINTs."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    doc_tok = (
        docs.select("doc_id", F.explode(_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    model = doc_tok.groupBy("tok").agg(F.sum("cnt").alias("c"))
    total = model.groupBy().agg(F.sum("c").alias("n_total"))
    lp = model.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            F.log(F.col("c").cast("double") / F.col("n_total").cast("double")) * 1e6
        )
        .cast("bigint")
        .alias("lp_micro"),
    )
    return (
        doc_tok.join(lp.hint("shuffle_hash"), "tok")  # vocab-sized: never broadcast
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            (-F.sum(F.col("cnt") * F.col("lp_micro"))).alias("surprisal_micro"),
            F.round(
                (-F.sum(F.col("cnt") * F.col("lp_micro"))).cast("double")
                / 1e6
                / F.sum("cnt"),
                4,
            ).alias("avg_surprisal_nats"),
        )
    )


ORACLE_UNIGRAM = """
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
), model AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
), total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks
), lp AS (
  SELECT tok,
         CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1e6) AS BIGINT)
           AS lp_micro
  FROM model, total
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(-SUM(l.lp_micro) AS BIGINT) AS surprisal_micro,
       ROUND(CAST(-SUM(l.lp_micro) AS DOUBLE) / 1e6 / COUNT(*), 4)
         AS avg_surprisal_nats
FROM toks t JOIN lp l USING (tok)
GROUP BY t.doc_id
"""


QUERIES.update(
    {
        "text_unigram_surprisal": (text_unigram_surprisal, ORACLE_UNIGRAM),
    }
)


BIGRAM_LAMBDA_NUM = 3  # interpolation weight 3/4 bigram, 1/4 unigram backoff


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring with unigram backoff — one step up the LM
    ladder from text_unigram_surprisal: score each document by the mean
    surprisal of its token transitions under an interpolated bigram model
    fit on the corpus itself, p(w2|w1) = (3/4)·c12/c1 + (1/4)·c2/N.
    Low-probability transitions (word salad, shuffled text, boilerplate
    splices) score high even when every individual token is common — the
    failure mode unigram surprisal is blind to.

    Determinism: the interpolation is evaluated as ONE IEEE division of two
    exact BIGINT products, p = (3·c12·N + c2·c1) / (4·c1·N), then quantized
    to integer micro-nats per DISTINCT bigram — per-doc accumulation is
    exact integer arithmetic, so engines can never disagree on summation
    order. (The bigint products cap out around N≈3e8 tokens per fit shard;
    a web-scale fit shards the corpus or moves the products to double.)

    Scale: the model tables are c12 (bigram vocab) and c1/c2 (unigram
    vocab) — both unbounded, so every model join is shuffle_hash keyed on
    the token(s), never a forced broadcast; N rides a broadcast scalar.
    All aggregates are map-side combinable."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = _tokens()
    bg = (
        docs.filter(F.size(ts) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(ts, 1, F.size(ts) - 1).alias("w1"),
                    F.slice(ts, 2, F.size(ts) - 1).alias("w2"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    toks = docs.select(F.explode(ts).alias("tok"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = toks.groupBy("tok").agg(F.count("*").alias("c2"))
    n_total = toks.groupBy().agg(F.count("*").alias("n_total"))
    lp = (
        c12.join(c1.hint("shuffle_hash"), "w1")
        .join(
            c2.hint("shuffle_hash").withColumnRenamed("tok", "w2"), "w2"
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (
                        F.lit(BIGRAM_LAMBDA_NUM) * F.col("c12") * F.col("n_total")
                        + F.col("c2") * F.col("c1")
                    ).cast("double")
                    / (F.lit(4) * F.col("c1") * F.col("n_total")).cast("double")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    return (
        bg.join(lp.hint("shuffle_hash"), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.sum("lp_micro")).alias("surprisal_micro"),
            F.round(
                (-F.sum("lp_micro")).cast("double") / 1e6 / F.count("*"), 4
            ).alias("avg_surprisal_nats"),
        )
    )


ORACLE_BIGRAM = f"""
WITH bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
), toks AS (
  SELECT tok FROM (SELECT string_split(text, ' ') AS ts FROM documents),
       unnest(ts) AS u(tok)
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
), c2 AS (
  SELECT tok AS w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM toks GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks
), lp AS (
  SELECT c12.w1, c12.w2,
         CAST(ROUND(ln(
           CAST({BIGRAM_LAMBDA_NUM} * c12.c12 * n.n_total + c2.c2 * c1.c1 AS DOUBLE)
           / CAST(4 * c1.c1 * n.n_total AS DOUBLE)
         ) * 1e6) AS BIGINT) AS lp_micro
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(-SUM(l.lp_micro) AS BIGINT) AS surprisal_micro,
       ROUND(CAST(-SUM(l.lp_micro) AS DOUBLE) / 1e6 / COUNT(*), 4)
         AS avg_surprisal_nats
FROM bg b JOIN lp l USING (w1, w2)
GROUP BY b.doc_id
"""


QUERIES.update(
    {
        "text_bigram_surprisal": (text_bigram_surprisal, ORACLE_BIGRAM),
    }
)


_LIFT_MIN_DF = 5
_LIFT_TOPK = 30


def text_token_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top token pairs by lift — the PMI ordering
    without the logarithm: lift(a,b) = n_ab * N / (n_a * n_b), and log is
    monotone, so ranking by the rational lift IS ranking by PMI while
    staying in exact-integer numerators/denominators (one IEEE division
    at the end; ties broken lexically).

    Scale: pairs are generated per document from its DISTINCT tokens after
    a doc-frequency floor prunes the long tail (the join fans out
    O(tokens_per_doc^2) within a doc, never across docs); counts are one
    hash aggregate. The df dim is vocabulary-sized — unbounded at web
    scale — so it joins shuffle_hash on token, never a forced broadcast."""
    docs = t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    )
    n_docs = docs.count()  # scalar: corpus size (benign driver scalar)
    df_tbl = (
        dt.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("df"))
        .filter(F.col("df") >= _LIFT_MIN_DF)
    )
    kept = dt.join(df_tbl.hint("shuffle_hash"), "tok")  # vocab-sized: never broadcast
    a = kept.select("doc_id", F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    b = kept.select("doc_id", F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "df_a", "df_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    lift = (F.col("n_ab") * F.lit(n_docs)).cast("double") / (
        F.col("df_a") * F.col("df_b")
    ).cast("double")
    return (
        pairs.select("tok_a", "tok_b", "n_ab", "df_a", "df_b", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(_LIFT_TOPK)
    )


ORACLE_TOKEN_LIFT = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), df_tbl AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
  FROM dt GROUP BY 1
  HAVING COUNT(*) >= {_LIFT_MIN_DF}
), kept AS (
  SELECT d.doc_id, d.tok, f.df FROM dt d JOIN df_tbl f USING (tok)
), pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2, 3, 4
)
SELECT tok_a, tok_b, n_ab, df_a, df_b,
       CAST(n_ab * n.n_docs AS DOUBLE) / CAST(df_a * df_b AS DOUBLE) AS lift
FROM pairs, n
ORDER BY lift DESC, tok_a, tok_b
LIMIT {_LIFT_TOPK}
"""


QUERIES.update(
    {
        "text_token_lift_topk": (text_token_lift_topk, ORACLE_TOKEN_LIFT),
    }
)


VOCAB_SIZES = (100, 1000, 10000)


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design report: corpus coverage of a frequency-built
    vocabulary at candidate sizes — for each K in VOCAB_SIZES, how many
    corpus token OCCURRENCES the top-K most frequent token TYPES cover
    (coverage_milli), i.e. the OOV rate a K-entry word-level vocab would
    pay on this corpus.

    The unit is the 3-token shingle (the corpus's synthetic word
    vocabulary is ~30 types — word-level coverage saturates instantly —
    while shingle types number in the tens of thousands, giving the
    report a real coverage curve; production would swap in BPE merge
    candidates, same plan).

    Scale: unit counting is one map-side-combinable groupBy. The global
    frequency rank over the VOCABULARY-sized count table never plans an
    unpartitioned window: ranks decompose as row_number within each
    count-DIGIT class (descending count, token tiebreak; more digits ==
    strictly larger count, so class order is total) plus the tiny
    per-class offset dim — the repo's two-level prefix-sum convention in
    descending form. Cumulative covered-occurrence sums ride the same
    decomposition. The K targets are a 3-row broadcast."""
    docs = t(spark, sf_dir, "documents")
    # project the token array ONCE before the gram transform: higher-order
    # function lambdas evaluate interpreted with no CSE across elements,
    # so the inline form re-ran split(text) per gram (the r11 re-split
    # family fix, guide §4.1); pin the vocab counts — THREE consumers (the
    # rank window, the per-digit-class totals, and the grand total) re-ran
    # the explode+count chain otherwise (guide §2.4). The pin is EAGER
    # (r12, VERDICT r11 item 1): a lazy localCheckpoint referenced by
    # several subtrees of one action can be computed concurrently by
    # sibling stages before its blocks land — the one mechanism that
    # could reproduce the driver's 5.4 s outlier at 32 cores; eager
    # materialization makes every consumer provably read stored blocks
    # (isolated fresh-JVM warm medians: eager 1.01/1.17 s, lazy 1.40/0.98,
    # unpinned 1.36 — all in-band on a quiet box, eager is the shape that
    # cannot race).
    counts = (
        docs.select(F.split(F.col("text"), " ").alias("ts0"))
        .filter(F.size("ts0") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts0) - 2), "
                    "i -> concat_ws(' ', slice(ts0, i, 3)))"
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("k", F.length(F.col("cnt").cast("string")))
        .localCheckpoint()
    )
    wk = (
        W.partitionBy("k")
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    within = counts.select(
        "k",
        "cnt",
        F.row_number().over(
            W.partitionBy("k").orderBy(F.col("cnt").desc(), F.col("tok").asc())
        ).alias("rn_in_k"),
        F.sum("cnt").over(wk).alias("cum_in_k"),
    )
    k_tot = counts.groupBy("k").agg(
        F.count("*").alias("ktypes"), F.sum("cnt").alias("kocc")
    )
    ka, kb = k_tot.alias("ka"), k_tot.alias("kb")
    offsets = (
        ka.join(kb, F.col("kb.k") > F.col("ka.k"), "left")
        .groupBy(F.col("ka.k").alias("k"))
        .agg(
            F.coalesce(F.sum("kb.ktypes"), F.lit(0)).alias("rank_off"),
            F.coalesce(F.sum("kb.kocc"), F.lit(0)).alias("occ_off"),
        )
    )
    ranked = within.join(F.broadcast(offsets), "k").select(
        (F.col("rn_in_k") + F.col("rank_off")).alias("rank"),
        (F.col("cum_in_k") + F.col("occ_off")).alias("cum_occ"),
    )
    total = counts.agg(
        F.sum("cnt").alias("total_occ"), F.count("*").alias("n_types")
    )
    sizes = spark.createDataFrame(
        [(int(v),) for v in VOCAB_SIZES], "vocab_k bigint"
    )
    # per K: covered occurrences = cum at rank min(K, n_types)
    return (
        ranked.crossJoin(F.broadcast(total))
        .join(
            F.broadcast(sizes),
            F.col("rank") == F.least(F.col("vocab_k"), F.col("n_types")),
        )
        .select(
            "vocab_k",
            F.col("n_types").cast("bigint").alias("n_token_types"),
            F.col("cum_occ").cast("bigint").alias("covered_occ"),
            F.col("total_occ").cast("bigint").alias("total_occ"),
            F.expr("CAST(1000 * cum_occ div total_occ AS BIGINT)").alias(
                "coverage_milli"
            ),
        )
    )


ORACLE_VOCAB_COVERAGE = f"""
WITH counts AS (
  SELECT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS tok,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT string_split(text, ' ') AS ts FROM documents),
       unnest(range(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 3
  GROUP BY 1
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
                        ROWS UNBOUNDED PRECEDING) AS cum_occ
  FROM counts
),
total AS (
  SELECT SUM(cnt) AS total_occ, COUNT(*) AS n_types FROM counts
),
sizes AS (
  SELECT unnest(ARRAY{list(VOCAB_SIZES)}) AS vocab_k
)
SELECT CAST(vocab_k AS BIGINT) AS vocab_k,
       CAST(n_types AS BIGINT) AS n_token_types,
       CAST(cum_occ AS BIGINT) AS covered_occ,
       CAST(total_occ AS BIGINT) AS total_occ,
       CAST(1000 * cum_occ // total_occ AS BIGINT) AS coverage_milli
FROM ranked, total, sizes
WHERE rank = LEAST(vocab_k, n_types)
"""


QUERIES.update(
    {
        "text_vocab_coverage": (text_vocab_coverage, ORACLE_VOCAB_COVERAGE),
    }
)


RAKE_N_STOP = 5  # data-derived stopword set: top-N most frequent tokens
RAKE_TOP_PHRASES = 3  # keyword phrases returned per document


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: split each document into candidate
    phrases at stopword boundaries (stopwords = the corpus's RAKE_N_STOP
    most frequent tokens — data-derived, like BM25's query terms), score
    every content word as degree/frequency over the phrase table, and
    return each document's RAKE_TOP_PHRASES best phrases by summed word
    score. deg(w) counts w's total phrase-mate mass (phrase length per
    occurrence, self included — the standard RAKE degree), freq(w) its
    occurrences; scores are exact integer milli (1000 * deg div freq),
    so phrase sums match bit-exactly across engines.

    Scale: phrase assembly is per-document windows (gaps-and-islands on
    token positions — doc-partitioned, never global); word stats are two
    map-side-combinable aggregates; the word-score dim is
    VOCABULARY-sized and rides a shuffle_hash join back onto the phrase
    words (repo rule: vocab dims never broadcast); the stopword set is a
    bounded LIMIT broadcast. Final per-doc top-k is a doc-partitioned
    row_number."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "tok")
    )
    stop = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(RAKE_N_STOP)
        .select(F.col("tok").alias("stop_tok"))
    )
    content = toks.join(
        F.broadcast(stop), toks.tok == F.col("stop_tok"), "left_anti"
    )
    w_isl = W.partitionBy("doc_id").orderBy("pos")
    islands = content.withColumn(
        "island", F.col("pos") - F.row_number().over(w_isl)
    )
    phrases = islands.groupBy("doc_id", "island").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.getField("tok"),
            ),
        ).alias("phrase"),
        F.count("*").cast("bigint").alias("plen"),
    )
    occurrences = islands.join(phrases, ["doc_id", "island"]).select(
        "doc_id", "island", "tok", "phrase", "plen"
    )
    word_scores = (
        occurrences.groupBy("tok")
        .agg(
            F.sum("plen").cast("bigint").alias("deg"),
            F.count("*").cast("bigint").alias("freq"),
        )
        .select("tok", F.expr("CAST(1000 * deg div freq AS BIGINT)").alias("wscore"))
    )
    scored = (
        occurrences.join(word_scores.hint("shuffle_hash"), "tok")
        .groupBy("doc_id", "island", "phrase")
        .agg(F.sum("wscore").cast("bigint").alias("score_milli"))
        .select("doc_id", "phrase", "score_milli")
        .distinct()
    )
    w_top = W.partitionBy("doc_id").orderBy(F.desc("score_milli"), F.asc("phrase"))
    return (
        scored.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= RAKE_TOP_PHRASES)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "phrase", "score_milli")
    )


ORACLE_RAKE = f"""
WITH toks AS (
  SELECT doc_id, u.i AS pos, ts[u.i] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       unnest(generate_series(1, len(ts))) AS u(i)
),
stop AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
  ) ORDER BY cnt DESC, tok LIMIT {RAKE_N_STOP}
),
content AS (
  SELECT * FROM toks WHERE tok NOT IN (SELECT tok FROM stop)
),
islands AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM content
),
phrases AS (
  SELECT doc_id, island,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM islands GROUP BY 1, 2
),
occurrences AS (
  SELECT i.doc_id, i.island, i.tok, p.phrase, p.plen
  FROM islands i JOIN phrases p ON i.doc_id = p.doc_id AND i.island = p.island
),
word_scores AS (
  SELECT tok, CAST(1000 * SUM(plen) // COUNT(*) AS BIGINT) AS wscore
  FROM occurrences GROUP BY 1
),
scored AS (
  SELECT DISTINCT doc_id, phrase, score_milli FROM (
    SELECT o.doc_id, o.island, o.phrase,
           CAST(SUM(w.wscore) AS BIGINT) AS score_milli
    FROM occurrences o JOIN word_scores w USING (tok)
    GROUP BY 1, 2, 3
  )
)
SELECT doc_id, CAST(rk AS INT) AS rk, phrase, score_milli
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_milli DESC, phrase) AS rk
  FROM scored
) WHERE rk <= {RAKE_TOP_PHRASES}
"""


QUERIES.update(
    {
        "text_rake_keywords": (text_rake_keywords, ORACLE_RAKE),
    }
)
