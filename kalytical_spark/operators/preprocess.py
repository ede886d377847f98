"""Training-data preprocessing operators over the documents table — the
pipeline stages that sit between raw crawl and tokenizer at 100 TB scale:
benchmark decontamination, repetition-based quality filters (Gopher-style),
context-window packing, and deterministic train/val/test splitting.

Design for scale:
* Decontamination joins the corpus n-grams against the BENCHMARK n-grams —
  the benchmark side is tiny (eval sets are KBs; the corpus is TBs), so the
  join is an explicit broadcast: corpus-side stays a single pass, no
  shuffle of the big side.
* Repetition stats are explode -> groupBy(doc_id) aggregations: map-side
  combinable, one shuffle keyed on doc_id, no Python in the row path.
* Packing is concat-and-chop per SOURCE shard (partitionBy(source) window),
  never a global ordering: a global cumulative sum would serialize 100 TB
  through one partition. Real pipelines pack per input shard exactly so the
  operation stays embarrassingly parallel.
* Split assignment is a pure hash of the stable doc key (md5 prefix ->
  bucket), no randomness, no shuffle beyond the final rollup — and the same
  document always lands in the same split across re-runs and engines.

Determinism: fractions are single IEEE divisions of exact integer counts,
rounded to 4 decimals BEFORE thresholding; bucket arithmetic is integer.

Reference parity: the reference engine has no corpus-preprocessing surface
(kalytical is a pipeline orchestrator; see SURVEY.md §2 note) — this module
is part of the LLM-training-data extension family the build brief mandates,
alongside operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import t

NGRAM = 8  # decontamination n-gram width (tokens)
BENCH_PROMPT_TOKENS = 12  # tokens taken per benchmark "prompt"
PACK_WINDOW = 512  # context-window size in (whitespace) tokens
TOP_TOKEN_MAX = 0.10  # Gopher-style: max fraction of the most common token
DUP_2GRAM_MAX = 0.05  # max fraction of duplicated 2-grams
# planted-copy keyspace: 2^40-scaled so re-keyed ids can never collide with
# genuine doc_ids at any realistic corpus size (a 100 TB corpus at 1 KB/doc
# is ~1e11 docs < 2^40); each planting family gets its own multiple
DECONTAM_PLANT_OFFSET = 2 << 40

_HEX = "0123456789abcdef"


def _toks() -> F.Column:
    return F.split(F.col("text"), " ")


def _grams(ts, n: int) -> F.Column:
    """All n-token grams of a token array as space-joined strings."""
    return F.transform(
        F.sequence(F.lit(0), F.size(ts) - n),
        lambda i: F.array_join(F.slice(ts, i + 1, n), " "),
    )


def _decontam_corpus_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gram): distinct NGRAM-token grams of the corpus-under-test
    (documents plus the planted re-crawl of every 82nd doc)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = _toks()
    leaked = (
        docs.filter(F.col("doc_id") % 82 == 0)
        .withColumn("doc_id", F.col("doc_id") + DECONTAM_PLANT_OFFSET)
    )
    corpus = docs.unionByName(leaked)
    n_part = spark.sparkContext.defaultParallelism
    # tokenize once into a column before the gram transform: slicing a
    # split(text) expression inside the lambda re-splits the document per
    # gram (interpreted higher-order function, no CSE across elements)
    return (
        corpus.filter(F.size(ts) >= NGRAM)
        .repartition(n_part, "doc_id")
        .select("doc_id", ts.alias("ts"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(_grams(F.col("ts"), NGRAM))).alias("gram"),
        )
    )


def _decontam_bench_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bench_id, gram): distinct grams of each synthetic benchmark prompt
    (every 41st document's first BENCH_PROMPT_TOKENS tokens)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = _toks()
    return (
        docs.filter((F.col("doc_id") % 41 == 0) & (F.size(ts) >= BENCH_PROMPT_TOKENS))
        .select(
            F.col("doc_id").alias("bench_id"),
            F.slice(ts, 1, BENCH_PROMPT_TOKENS).alias("ts"),
        )
        .select(
            "bench_id",
            F.explode(F.array_distinct(_grams(F.col("ts"), NGRAM))).alias("gram"),
        )
    )


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    8-token gram with a benchmark prompt (the standard n-gram-overlap
    decontamination used for LLM training corpora). The synthetic
    "benchmark" is every 41st document's first 12 tokens; the corpus under
    test is the documents table PLUS a re-keyed copy of every 82nd document
    (a leaked re-crawl of eval material — cross-doc contamination, so the
    check is non-vacuous beyond trivial self-matches).

    The benchmark gram set is broadcast: at 100 TB the eval suite is
    kilobytes while the corpus side streams through map tasks untouched.
    """
    corpus_grams = _decontam_corpus_grams(spark, sf_dir)
    bench_grams = _decontam_bench_grams(spark, sf_dir)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_hits"),
            F.countDistinct("gram").alias("n_gram_hits"),
            F.min("bench_id").alias("first_bench_id"),
        )
    )


_SQL_DECONTAM_CTES = f"""corpus AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  UNION ALL
  SELECT doc_id + {DECONTAM_PLANT_OFFSET}, string_split(text, ' ') FROM documents WHERE doc_id % 82 = 0
), corpus_grams AS (
  SELECT DISTINCT doc_id, list_aggregate(ts[i:i+{NGRAM - 1}], 'string_agg', ' ') AS gram
  FROM corpus, unnest(range(1, len(ts) - {NGRAM - 2})) AS u(i)
  WHERE len(ts) >= {NGRAM}
), bench_grams AS (
  SELECT DISTINCT doc_id AS bench_id,
         list_aggregate(ts[i:i+{NGRAM - 1}], 'string_agg', ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ')[1:{BENCH_PROMPT_TOKENS}] AS ts
        FROM documents
        WHERE doc_id % 41 = 0
          AND len(string_split(text, ' ')) >= {BENCH_PROMPT_TOKENS}),
       unnest(range(1, {BENCH_PROMPT_TOKENS - NGRAM + 2})) AS u(i)
)"""

ORACLE_DECONTAM = f"""
WITH {_SQL_DECONTAM_CTES}
SELECT c.doc_id,
       CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_hits,
       CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_gram_hits,
       MIN(b.bench_id) AS first_bench_id
FROM corpus_grams c JOIN bench_grams b USING (gram)
GROUP BY c.doc_id
"""


def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: per document, the fraction
    of tokens taken by the single most common token and the fraction of
    duplicated 2-grams; a document passes when both stay under threshold.
    Two explode->groupBy(doc_id) aggregations (map-side combinable, one
    shuffle each) joined on doc_id — no Python in the row path."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = _toks()
    n_part = spark.sparkContext.defaultParallelism
    base = docs.repartition(n_part, "doc_id")
    tok_stats = (
        base.select("doc_id", F.explode(ts).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("top_c"))
    )
    gram_stats = (
        base.filter(F.size(ts) >= 2)
        .select("doc_id", ts.alias("ts"))  # tokenize once, not per gram
        .select("doc_id", F.explode(_grams(F.col("ts"), 2)).alias("g2"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("tot_2g"), F.countDistinct("g2").alias("dis_2g"))
    )
    top_frac = F.round(F.col("top_c").cast("double") / F.col("n_tokens"), 4)
    # LEFT join: a 1-token document has no 2-gram row but must still get a
    # verdict (its dup fraction is 0.0 — nothing repeats) — an inner join
    # would silently drop it from the quality ledger
    dup_frac = F.round(
        F.coalesce(
            (F.col("tot_2g") - F.col("dis_2g")).cast("double") / F.col("tot_2g"),
            F.lit(0.0),
        ),
        4,
    )
    return (
        tok_stats.join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_token_frac"),
            dup_frac.alias("dup_2gram_frac"),
            (
                (top_frac <= TOP_TOKEN_MAX) & (dup_frac <= DUP_2GRAM_MAX)
            ).alias("gopher_pass"),
        )
    )


ORACLE_REPETITION = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), tok_stats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_c
  FROM (SELECT doc_id, COUNT(*) AS c
        FROM toks, unnest(ts) AS u(tok) GROUP BY doc_id, tok)
  GROUP BY doc_id
), gram_stats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tot_2g,
         CAST(COUNT(DISTINCT g2) AS BIGINT) AS dis_2g
  FROM (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g2
        FROM toks, unnest(range(1, len(ts))) AS u(i)
        WHERE len(ts) >= 2)
  GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       ROUND(CAST(t.top_c AS DOUBLE) / t.n_tokens, 4) AS top_token_frac,
       ROUND(COALESCE(CAST(g.tot_2g - g.dis_2g AS DOUBLE) / g.tot_2g, 0.0), 4)
         AS dup_2gram_frac,
       (ROUND(CAST(t.top_c AS DOUBLE) / t.n_tokens, 4) <= {TOP_TOKEN_MAX}
        AND ROUND(COALESCE(CAST(g.tot_2g - g.dis_2g AS DOUBLE) / g.tot_2g, 0.0), 4)
              <= {DUP_2GRAM_MAX})
         AS gopher_pass
FROM tok_stats t LEFT JOIN gram_stats g USING (doc_id)
"""


def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing: within each SOURCE shard, documents
    are concatenated in doc_id order and chopped into fixed 512-token
    context windows; per (source, window) report how many documents touch
    it, start in it, cross out of it, and how many tokens it holds (== 512
    everywhere except each shard's final window).

    Packing is per-shard on purpose: a single global cumulative sum would
    funnel the whole corpus through one partition. partitionBy(source)
    keeps the window function embarrassingly parallel — the 100 TB shape.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(_toks()).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_prev"),
    ).select(
        "*",
        F.expr(f"cum_prev DIV {PACK_WINDOW}").alias("start_w"),
        F.expr(f"(cum_prev + n_tok - 1) DIV {PACK_WINDOW}").alias("end_w"),
    )
    win = F.col("win")
    tokens_here = F.least(
        (win + 1) * PACK_WINDOW, F.col("cum_prev") + F.col("n_tok")
    ) - F.greatest(win * PACK_WINDOW, F.col("cum_prev"))
    return (
        placed.select(
            "*", F.explode(F.sequence("start_w", "end_w")).alias("win")
        )
        .groupBy("source", "win")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((win == F.col("start_w")).cast("bigint")).alias("n_starting"),
            F.sum((win < F.col("end_w")).cast("bigint")).alias("n_crossing_out"),
            F.sum(tokens_here).alias("tokens_filled"),
        )
    )


ORACLE_PACK = f"""
WITH placed AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
  FROM (SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents)
), spans AS (
  SELECT *, cum_prev // {PACK_WINDOW} AS start_w,
            (cum_prev + n_tok - 1) // {PACK_WINDOW} AS end_w
  FROM placed
)
SELECT source, win,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN win = start_w THEN 1 ELSE 0 END) AS BIGINT) AS n_starting,
       CAST(SUM(CASE WHEN win < end_w THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing_out,
       CAST(SUM(LEAST((win + 1) * {PACK_WINDOW}, cum_prev + n_tok)
                - GREATEST(win * {PACK_WINDOW}, cum_prev)) AS BIGINT) AS tokens_filled
FROM spans, unnest(range(start_w, end_w + 1)) AS u(win)
GROUP BY source, win
"""


def split_assign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first two hex
    digits of md5(doc_id) -> 0..255; <205 train (~80%), <230 val (~10%),
    else test. Pure hash of the stable key — the same document lands in the
    same split on every engine and every re-run, with no shuffled
    randomness. Rolled up per (split, lang)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("long")
    split = (
        F.when(bucket < 205, F.lit("train"))
        .when(bucket < 230, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(_toks()).cast("bigint").alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


ORACLE_SPLIT = """
WITH assigned AS (
  SELECT CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
         lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS b,
               lang, text
        FROM documents)
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM assigned
GROUP BY split, lang
"""


CONTAINMENT_FLAG_MILLI = 500  # flag docs holding >= half of a prompt's grams


def decontam_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment decontamination: per (document, benchmark
    prompt) pair sharing any gram, what FRACTION of the prompt's grams the
    document contains — 1000 * |grams(doc) ∩ grams(bench)| // |grams(bench)|
    in exact integer milli-units. Containment is the decontamination metric
    that catches a short eval item quoted inside a long document, where
    symmetric Jaccard dilutes toward zero and a raw hit count understates
    coverage. Same broadcast shape as decontam_ngram_overlap: the bench
    gram dimension is eval-suite-sized (kilobytes at 100 TB), the corpus
    side streams map-only until the final per-pair aggregate."""
    corpus_grams = _decontam_corpus_grams(spark, sf_dir)
    bench_grams = _decontam_bench_grams(spark, sf_dir)
    bench_sizes = bench_grams.groupBy("bench_id").agg(
        F.count("*").cast("bigint").alias("n_bench_grams")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("gram").cast("bigint").alias("n_common"))
        .join(F.broadcast(bench_sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            "n_common",
            "n_bench_grams",
            F.expr("CAST(1000 * n_common div n_bench_grams AS INT)").alias(
                "containment_milli"
            ),
            (
                F.expr("1000 * n_common div n_bench_grams")
                >= F.lit(CONTAINMENT_FLAG_MILLI)
            ).alias("flagged"),
        )
    )


ORACLE_CONTAINMENT = f"""
WITH {_SQL_DECONTAM_CTES},
sizes AS (
  SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_bench_grams
  FROM bench_grams GROUP BY 1
), common AS (
  SELECT c.doc_id, b.bench_id, CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_common
  FROM corpus_grams c JOIN bench_grams b USING (gram)
  GROUP BY 1, 2
)
SELECT doc_id, bench_id, n_common, n_bench_grams,
       CAST(1000 * n_common // n_bench_grams AS INTEGER) AS containment_milli,
       1000 * n_common // n_bench_grams >= {CONTAINMENT_FLAG_MILLI} AS flagged
FROM common JOIN sizes USING (bench_id)
"""


def decontam_longest_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination SEVERITY: for each (corpus doc, benchmark prompt)
    pair that shares any NGRAM-token gram, the length in tokens of the
    LONGEST CONTIGUOUS shared run — the signal that separates "one
    boilerplate phrase in common" (8-token run) from "the whole prompt is
    embedded verbatim" (full-prompt run). decontam_ngram_overlap counts
    hits; this reports their geometry, which is what an actual
    decontamination triage sorts by.

    Plan: POSITIONAL corpus grams (no distinct — position matters), the
    kilobyte-scale bench gram set broadcast, then the gaps-and-islands
    merge from the substring-span family (spans.py) partitioned by
    (doc_id, bench_id): a run of w consecutive matching windows is a
    contiguous overlap of w + NGRAM - 1 tokens. Non-vacuity: every
    planted re-crawl (doc_id % 82 == 0, re-keyed + DECONTAM_PLANT_OFFSET)
    is a copy of a benchmark source doc (82 = 2 x 41), so its prefix
    contains that prompt verbatim — the full BENCH_PROMPT_TOKENS run must
    surface for those pairs."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = _toks()
    leaked = (
        docs.filter(F.col("doc_id") % 82 == 0)
        .withColumn("doc_id", F.col("doc_id") + DECONTAM_PLANT_OFFSET)
    )
    corpus = (
        docs.unionByName(leaked)
        .filter(F.size(ts) >= NGRAM)
        .select("doc_id", ts.alias("ts"))  # tokenize once, not per gram
    )
    pos_grams = corpus.select(
        "doc_id",
        F.posexplode(_grams(F.col("ts"), NGRAM)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    bench_grams = _decontam_bench_grams(spark, sf_dir)
    hits = pos_grams.join(F.broadcast(bench_grams), "gram").select(
        "doc_id", "bench_id", "pos"
    )
    wpair = Window.partitionBy("doc_id", "bench_id").orderBy("pos")
    isl = hits.withColumn("isl", F.col("pos") - F.row_number().over(wpair))
    runs = isl.groupBy("doc_id", "bench_id", "isl").agg(
        (F.max("pos") - F.min("pos") + F.lit(NGRAM)).alias("run_toks"),
        F.count("*").alias("n_windows"),
    )
    return runs.groupBy("doc_id", "bench_id").agg(
        F.max("run_toks").cast("bigint").alias("longest_run_toks"),
        F.sum("n_windows").cast("bigint").alias("n_hit_windows"),
        F.count("*").cast("bigint").alias("n_runs"),
    )


ORACLE_LONGEST_RUN = f"""
WITH corpus AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  UNION ALL
  SELECT doc_id + {DECONTAM_PLANT_OFFSET}, string_split(text, ' ')
  FROM documents WHERE doc_id % 82 = 0
),
pos_grams AS (
  SELECT doc_id, i AS pos,
         list_aggregate(ts[i:i+{NGRAM - 1}], 'string_agg', ' ') AS gram
  FROM corpus, unnest(range(1, len(ts) - {NGRAM - 2})) AS u(i)
  WHERE len(ts) >= {NGRAM}
),
bench_grams AS (
  SELECT DISTINCT doc_id AS bench_id,
         list_aggregate(ts[i:i+{NGRAM - 1}], 'string_agg', ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ')[1:{BENCH_PROMPT_TOKENS}] AS ts
        FROM documents
        WHERE doc_id % 41 = 0
          AND len(string_split(text, ' ')) >= {BENCH_PROMPT_TOKENS}),
       unnest(range(1, {BENCH_PROMPT_TOKENS - NGRAM + 2})) AS u(i)
),
hits AS (
  SELECT c.doc_id, b.bench_id, c.pos
  FROM pos_grams c JOIN bench_grams b USING (gram)
),
isl AS (
  SELECT doc_id, bench_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id, bench_id ORDER BY pos)
           AS isl
  FROM hits
),
runs AS (
  SELECT doc_id, bench_id, MAX(pos) - MIN(pos) + {NGRAM} AS run_toks,
         COUNT(*) AS n_windows
  FROM isl GROUP BY doc_id, bench_id, isl
)
SELECT doc_id, bench_id,
       CAST(MAX(run_toks) AS BIGINT) AS longest_run_toks,
       CAST(SUM(n_windows) AS BIGINT) AS n_hit_windows,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs
GROUP BY doc_id, bench_id
"""


QUERIES = {
    "decontam_ngram_overlap": (decontam_ngram_overlap, ORACLE_DECONTAM),
    "decontam_longest_run": (decontam_longest_run, ORACLE_LONGEST_RUN),
    "decontam_containment": (decontam_containment, ORACLE_CONTAINMENT),
    "text_repetition_filters": (text_repetition_filters, ORACLE_REPETITION),
    "pack_context_windows": (pack_context_windows, ORACLE_PACK),
    "split_assign_stats": (split_assign_stats, ORACLE_SPLIT),
}


CHUNK_TOKENS = 16  # RAG/embedding chunk width (sized to the ~30-token synthetic docs
CHUNK_STRIDE = 12  # so the overlap path genuinely fires; prod would use 512/384)


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the RAG / embedding-prep
    shape): each document becomes ceil-strided CHUNK_TOKENS-token chunks
    with a CHUNK_TOKENS-CHUNK_STRIDE overlap; per chunk we emit its offsets and an md5 of the
    chunk text (a value-level proof both engines sliced identically —
    payload text itself stays out of the comparison).

    One explode per document (fan-out = n_tokens/stride, ~constant) with
    all slicing in JVM expressions — no shuffle at all until a consumer
    aggregates, which is the 100 TB shape: chunking is a map-side
    transform of the corpus scan."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.split(F.col("text"), " ")
    n = F.size(ts)
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.expr(
            f"(size(split(text, ' ')) - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1}) "
            f"DIV {CHUNK_STRIDE} + 1"
        )
    )
    exploded = docs.select(
        "doc_id",
        ts.alias("ts"),
        n.alias("n_tok"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    width = F.least(F.lit(CHUNK_TOKENS), F.col("n_tok") - start)
    chunk = F.slice(F.col("ts"), start + 1, width)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        width.cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


ORACLE_CHUNKS = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ts,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), fanned AS (
  SELECT doc_id, ts, n_tok, CAST(k AS INT) AS chunk_idx
  FROM docs, unnest(range(0,
      CASE WHEN n_tok <= {CHUNK_TOKENS} THEN 1
           ELSE (n_tok - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE} + 1
      END)) AS u(k)
)
SELECT doc_id, chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(LEAST({CHUNK_TOKENS}, n_tok - chunk_idx * {CHUNK_STRIDE}) AS BIGINT)
         AS n_chunk_tokens,
       md5(list_aggregate(
             ts[chunk_idx * {CHUNK_STRIDE} + 1 :
                chunk_idx * {CHUNK_STRIDE}
                + LEAST({CHUNK_TOKENS}, n_tok - chunk_idx * {CHUNK_STRIDE})],
             'string_agg', ' ')) AS chunk_hash
FROM fanned
"""


QUERIES.update(
    {
        "chunk_documents": (chunk_documents, ORACLE_CHUNKS),
    }
)
