"""Distributed BPE tokenizer training (Sennrich et al. 2016, public
literature): iterative corpus-wide byte-pair counting -> argmax merge ->
greedy re-segmentation, for a fixed merge budget BPE_MERGES.

Spark-first shape (the classic trainer, distributed):

1. ONE corpus pass builds the word-frequency table (map-side-combinable
   groupBy) — every later iteration runs over this VOCABULARY-sized
   table with per-type corpus weights, never over the corpus again. This
   is exactly how production BPE trainers scale: the corpus is read once,
   the loop touches only (word_type, freq, symbol_list) rows.
2. Per merge round: adjacent symbol pairs explode from each word's
   symbol array weighted by freq (one map-side-combinable groupBy), the
   winning pair is a deterministic argmax (count DESC, pair ASC — total
   order), and the merge applies as a JVM-side `aggregate()` fold over
   each symbol array — greedy left-to-right, the textbook semantics:
   after a merge the new symbol is strictly longer than its left parent,
   so a fold that compares "last emitted symbol == left" can never
   accidentally chain through a just-merged token (proven by the
   a==b run case: [a,a,a] -> [aa,a]).
3. The winning pair rides a broadcast LEFT join (1 row; LEFT so a
   merge budget that exhausts all pairs degrades to identity instead of
   wiping the state), and the state is `localCheckpoint`ed every round —
   each round references the previous state twice (pair count + merge
   apply), the lineage-blowup shape components.py documents.

Driver traffic: zero corpus-sized collects; the loop is bounded driver
CONTROL only (round counter). Merge rows stay DataFrames (union of
BPE_MERGES one-row checkpointed frames).

DuckDB oracle: the same trajectory as statically generated MATERIALIZED
CTE chains (memory: multiply-referenced chained CTEs must materialize or
DuckDB inlines them exponentially), with the greedy fold expressed as
`list_reduce` over a delimiter-encoded accumulator (chr(1) never occurs
in corpus tokens): last emitted symbol == left-parent iff the encoded
accumulator equals it or ends with chr(1)||left. The two engines use
structurally different fold encodings (array fold vs string fold), so a
value match is a genuine differential proof of the merge semantics.

Base segmentation is per-character with NO end-of-word marker (the
corpus is pre-tokenized synthetic word soup; a production byte-level
variant would prepend the GPT-2 space marker — same plan, one extra
symbol per word).

Reference scope: westernspion/kalytical has no text analytics; BPE
training is part of the mandated LLM-data-pipeline surface (the
production swap-in text.py:text_vocab_coverage's docstring names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import app_key, session_memo, t

BPE_MERGES = 12

# both bpe queries share one trained trajectory per (session, sf_dir):
# (merge_table_df, final_state_df), both localCheckpoint-backed
_BPE_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = session_memo({})

_FOLD_MERGE = """
aggregate(
  syms,
  cast(array() as array<string>),
  (acc, x) -> IF(
    size(acc) > 0 AND element_at(acc, -1) = pa AND x = pb,
    concat(slice(acc, 1, size(acc) - 1), array(concat(pa, pb))),
    concat(acc, array(x))))
"""


def _train(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    key = (app_key(spark), sf_dir)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    docs = t(spark, sf_dir, "documents")
    state = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
        .localCheckpoint()
    )
    merge_rows: list[DataFrame] = []
    for r in range(1, BPE_MERGES + 1):
        best = (
            # size >= 2 filter BEFORE the sequence: Spark sequence(0, -1)
            # flips DESCENDING (yields [0,-1]) instead of empty
            state.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS pa, syms[i + 1] AS pb))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pa").asc(), F.col("pb").asc())
            .limit(1)
            .localCheckpoint()
        )
        state = (
            state.join(F.broadcast(best), F.lit(True), "left")
            .select(
                "word",
                "freq",
                F.when(F.col("pa").isNull(), F.col("syms"))
                .otherwise(F.expr(_FOLD_MERGE))
                .alias("syms"),
            )
            .localCheckpoint()
        )
        tokens_after = state.agg(
            F.sum(F.col("freq") * F.size("syms")).cast("bigint").alias("tokens_after")
        )
        merge_rows.append(
            best.withColumn("merge_rank", F.lit(r).cast("bigint")).crossJoin(
                F.broadcast(tokens_after)
            )
        )
    merges = merge_rows[0]
    for df in merge_rows[1:]:
        merges = merges.unionByName(df)
    merges = merges.select(
        "merge_rank",
        F.col("pa").alias("left_sym"),
        F.col("pb").alias("right_sym"),
        F.col("cnt").alias("pair_weight"),
        "tokens_after",
    ).localCheckpoint()
    _BPE_CACHE[key] = (merges, state)
    return _BPE_CACHE[key]


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: one row per merge round — the winning
    adjacent pair, its corpus-weighted adjacency count at selection time,
    and the corpus token count AFTER applying the merge (the compression
    trajectory; tokens_after < pair_weight reduction happens only in
    a==b runs, where 2k-1 adjacencies yield k merges)."""
    merges, _ = _train(spark, sf_dir)
    return merges


def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final tokenizer vocabulary in corpus use: every symbol surviving in
    the final segmentation with its corpus occurrence count and the
    number of word types using it — pins the entire final state, so
    together with the merge table the whole trajectory is value-proven."""
    _, state = _train(spark, sf_dir)
    return (
        state.select("freq", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.sum("freq").cast("bigint").alias("occ_count"),
            F.count("*").cast("bigint").alias("n_word_positions"),
        )
    )


def _oracle_ctes() -> str:
    fold = (
        "string_split(list_reduce(syms, (acc, x) -> CASE "
        "WHEN x = b.pb AND (acc = b.pa OR ends_with(acc, chr(1) || b.pa)) "
        "THEN acc[1:len(acc)-len(b.pa)] || b.pa || b.pb "
        "ELSE acc || chr(1) || x END), chr(1))"
    )
    parts = [
        """bpe_wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 GROUP BY 1
),
bpe_st0 AS MATERIALIZED (
  SELECT word, freq,
         list_transform(generate_series(1, len(word)), i -> word[i]) AS syms
  FROM bpe_wf
)"""
    ]
    for r in range(1, BPE_MERGES + 1):
        parts.append(
            f"""bpe_pairs{r} AS MATERIALIZED (
  SELECT syms[i] AS pa, syms[i + 1] AS pb, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM bpe_st{r - 1}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2
),
bpe_best{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS merge_rank, pa, pb, cnt
  FROM bpe_pairs{r} ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1
),
bpe_st{r} AS MATERIALIZED (
  SELECT word, freq,
         CASE WHEN b.pa IS NULL THEN syms ELSE {fold} END AS syms
  FROM bpe_st{r - 1} LEFT JOIN bpe_best{r} b ON TRUE
),
bpe_tok{r} AS MATERIALIZED (
  SELECT CAST(SUM(freq * len(syms)) AS BIGINT) AS tokens_after FROM bpe_st{r}
)"""
        )
    return ",\n".join(parts)


ORACLE_BPE_MERGES = (
    "WITH "
    + _oracle_ctes()
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT b.merge_rank, b.pa AS left_sym, b.pb AS right_sym, "
        f"b.cnt AS pair_weight, t.tokens_after "
        f"FROM bpe_best{r} b, bpe_tok{r} t"
        for r in range(1, BPE_MERGES + 1)
    )
)

ORACLE_BPE_VOCAB = (
    "WITH "
    + _oracle_ctes()
    + f"""
SELECT symbol, CAST(SUM(freq) AS BIGINT) AS occ_count,
       CAST(COUNT(*) AS BIGINT) AS n_word_positions
FROM (SELECT freq, unnest(syms) AS symbol FROM bpe_st{BPE_MERGES})
GROUP BY 1
"""
)


def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-in-use report: encode the corpus under the trained
    tokenizer and roll up fertility per language — the number every
    multilingual tokenizer paper reports (tokens/word: how many BPE
    pieces a word costs; chars/token: how much text one token carries).

    Encoding = ONE broadcast-free join of corpus words against the
    trained (word -> symbol list) table: training already segmented every
    word TYPE, so per-occurrence encoding is a lookup, not a re-fold —
    exactly how production BPE serving works (the merges bake into a
    word-type cache). The word-type dim is vocabulary-sized, so the join
    rides shuffle_hash per the repo rule. Also proves detokenization:
    concat(symbols) must equal the word for every type (detok_exact —
    folded into the oracle as a TRUE-assertion alongside exact counts the
    twin recomputes from its own trajectory)."""
    docs = t(spark, sf_dir, "documents")
    _, state = _train(spark, sf_dir)
    seg = state.select(
        "word",
        F.size("syms").cast("bigint").alias("n_pieces"),
        (F.expr("concat_ws('', syms)") == F.col("word")).alias("detok_ok"),
    )
    occ = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
    )
    return (
        occ.join(seg.hint("shuffle_hash"), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.min("detok_ok").alias("detok_exact"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("CAST(1000 * n_tokens div n_words AS BIGINT)").alias(
                "fertility_milli"
            ),
            F.expr("CAST(1000 * n_chars div n_tokens AS BIGINT)").alias(
                "chars_per_token_milli"
            ),
            "detok_exact",
        )
    )


ORACLE_BPE_ENCODE = (
    "WITH "
    + _oracle_ctes()
    + f""",
bpe_occ AS (
  SELECT lang, word FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE len(word) > 0
),
bpe_seg AS (
  SELECT word, CAST(len(syms) AS BIGINT) AS n_pieces FROM bpe_st{BPE_MERGES}
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_pieces) AS BIGINT) AS n_tokens,
       CAST(1000 * SUM(n_pieces) // COUNT(*) AS BIGINT) AS fertility_milli,
       CAST(1000 * SUM(length(word)) // SUM(n_pieces) AS BIGINT)
         AS chars_per_token_milli,
       TRUE AS detok_exact
FROM bpe_occ JOIN bpe_seg USING (word)
GROUP BY 1
"""
)


QUERIES: dict[str, tuple] = {
    "text_bpe_merges": (text_bpe_merges, ORACLE_BPE_MERGES),
    "text_bpe_vocab": (text_bpe_vocab, ORACLE_BPE_VOCAB),
    "text_bpe_encode_stats": (text_bpe_encode_stats, ORACLE_BPE_ENCODE),
}
