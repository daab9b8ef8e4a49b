"""LLM training-data plans, third sweep (SURVEY.md §2 C31–C35).

Corpus-preparation operators beyond the dedup/quality families:
chunk-hash dedup (the CCNet paragraph-dedup shape on flat-text docs),
corpus heavy-hitter n-grams, temperature-based source mixing (the
multilingual-pretraining resampling rule), a per-source dataset-card
aggregate, and sequence packing into fixed token budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    hash64,
    shingles,
    sql_hash64,
    sql_shingles,
    sql_tokens,
    tokens,
)
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- C31

CHUNK_TOKENS = 16

_C31_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
chunks AS (
  SELECT doc_id, i AS idx,
         CAST(CEIL(len(t) / {CHUNK_TOKENS}.0) AS BIGINT) AS n_chunks,
         array_to_string(
           t[((i-1)*{CHUNK_TOKENS}+1):(i*{CHUNK_TOKENS})], ' ') AS chunk
  FROM toks,
       unnest(generate_series(
         1, CAST(CEIL(len(t) / {CHUNK_TOKENS}.0) AS BIGINT))) AS u(i)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {sql_hash64("chunk")} ORDER BY doc_id, idx) AS rn
  FROM chunks
)
SELECT doc_id,
       MIN(n_chunks) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(chunk, ' ' ORDER BY idx) AS text_deduped
FROM ranked WHERE rn = 1
GROUP BY doc_id
ORDER BY doc_id
"""


@register("paragraph_dedup", oracle=_C31_ORACLE)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk-hash dedup — the CCNet/RefinedWeb paragraph
    dedup stage, with fixed 16-token chunks standing in for paragraphs
    (the testdata docs are flat word streams with no newlines).

    Every chunk keeps only its FIRST occurrence corpus-wide
    (min doc_id, then min chunk index); docs are reassembled from
    their surviving chunks, and a doc whose every chunk duplicates an
    earlier one drops out entirely — exactly the CCNet rule.

    Scale shape: chunking is a map-side posexplode (~tokens/16 rows per
    doc); first-occurrence is ONE window over the chunk-hash
    partitioning (the only wide shuffle — equivalent placement to a
    groupBy on the hash); reassembly groups by doc_id with a sorted
    in-group collect. No self-join, no driver state.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / float(CHUNK_TOKENS)).cast("bigint")
    chunk_arr = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
        ),
    )
    chunks = (
        docs.select(
            "doc_id",
            n_chunks.alias("n_chunks"),
            F.posexplode(chunk_arr).alias("idx0", "chunk"),
        )
        .select(
            "doc_id",
            "n_chunks",
            (F.col("idx0") + 1).alias("idx"),
            "chunk",
            hash64(F.col("chunk")).alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy("doc_id", "idx")
    kept = chunks.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.min("n_chunks").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_deduped"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C32

HH_TOP_K = 20
HH_NGRAM = 3

_C32_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
grams AS (
  SELECT doc_id, unnest({sql_shingles("t", HH_NGRAM)}) AS gram FROM toks
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM grams
GROUP BY gram
ORDER BY doc_freq DESC, gram
LIMIT {HH_TOP_K}
"""


@register("heavy_hitters_ngrams", oracle=_C32_ORACLE)
def heavy_hitters_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: the {HH_TOP_K} word {HH_NGRAM}-grams
    appearing in the most documents — the boilerplate detector that
    feeds template-removal and the stock n-gram blocklists.

    Scale shape: shingling is map-side (distinct per doc, so the count
    IS document frequency); the groupBy count is map-side combined
    (one wide shuffle at gram grain); global top-k is a
    TakeOrderedAndProject, never a full sort. At 100 TB the same plan
    holds — the combiner collapses each partition's grams before the
    shuffle, so the reducer sees |distinct grams|, not |tokens|, rows.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = docs.select(
        F.explode(shingles(tokens(F.col("text")), HH_NGRAM)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(HH_TOP_K)
    )


# ---------------------------------------------------------------- C33

MIX_ALPHA = 0.5  # temperature exponent: rate ∝ n^(alpha-1)

_C33_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
         100 * POW((SELECT MIN(n) FROM counts)::DOUBLE / n,
                   {1 - MIX_ALPHA}) AS rate
  FROM counts
)
SELECT doc_id, d.lang,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
FROM documents d JOIN rates USING (lang)
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < rate
ORDER BY doc_id
"""


@register("temperature_mixing", oracle=_C33_ORACLE)
def temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing — the multilingual
    pretraining sampling rule (XLM-R / mT5): keep-rate per stratum
    ∝ n^(alpha-1), normalised so the SMALLEST language keeps 100%.
    With alpha=0.5 a 10×-larger language is downsampled ~3.2×, which
    flattens the mix without upsampling anything.

    Unlike `stratified_sample` (C19 — fixed per-language rates), the
    rates here are DERIVED from the corpus in a first aggregate pass.

    Scale shape: pass 1 is a map-side-combined count to |langs| rows;
    the min attaches as a scalar over that tiny frame; pass 2 is a
    map-only filter with the |langs|-row rate table broadcast — the
    fact table is scanned once per pass and never shuffled. Selection
    is a content-derived md5 bucket (reproducible across engines,
    runs, and repartitioning), never rand().
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy(F.lit(1))
    rates = counts.select(
        "lang",
        (
            100
            * F.pow(
                F.min("n").over(w_all).cast("double") / F.col("n"),
                1 - MIX_ALPHA,
            )
        ).alias("rate"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("doc_id", "lang", bucket.alias("bucket"), "rate")
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C34

_C34_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len({sql_tokens("text")})) AS BIGINT) AS total_tokens,
       {sql_round("AVG(n_chars)", 4)} AS mean_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       {sql_round("quantile_cont(n_chars, 0.5)", 4)} AS median_chars
FROM documents
GROUP BY source
ORDER BY source
"""


@register("corpus_stats", oracle=_C34_ORACLE)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: doc count, token volume, char-length
    mean/median, language variety — the summary block every corpus
    release ships and every mixing decision starts from.

    Scale shape: ONE aggregate pass over a 4-column scan; count/sum/
    mean combine map-side. The exact median is the oracle-parity
    choice at test SFs — at 100 TB swap `percentile` for
    `approx_percentile` (mergeable sketch, no per-group sort buffer),
    the same documented switch as weekly_salary_spread / A37 —
    executable via SPARK_GRAFT_SCALE_MODE=approx (scale_mode.py).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", "n_chars", "text"
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias(
                "total_tokens"
            ),
            round_eps(F.avg("n_chars"), 4).alias("mean_chars"),
            F.count_distinct("lang").alias("n_langs"),
            round_eps(
                sm.percentile(F.col("n_chars"), 0.5), 4
            ).alias("median_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------- C35

PACK_CAP = 1024  # tokens per packed training sequence
PACK_BUCKETS = 8

_C35_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,
         CAST(len({sql_tokens("text")}) AS BIGINT) AS n_tok
  FROM documents
),
runs AS (
  SELECT doc_id, bucket, n_tok,
         SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM sized
)
SELECT doc_id, bucket, n_tok,
       CAST(FLOOR((cum - n_tok) / {PACK_CAP}.0) AS BIGINT) AS seq_id
FROM runs
ORDER BY doc_id
"""


@register("sequence_packing", oracle=_C35_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-token-budget training
    sequences ({PACK_CAP} tokens) by streaming fill in deterministic
    doc_id order — the standard pre-tokenisation packing pass.

    Assignment rule: a doc belongs to the sequence where its FIRST
    token lands (floor of the preceding cumulative count / cap), so a
    sequence can overflow by at most one doc's tail — the streaming
    "pack then spill" rule, chosen because it needs one window pass
    instead of a sequential first-fit loop.

    Scale shape: packing runs independently inside {PACK_BUCKETS}
    hash buckets (a global order would serialise the corpus through
    one reducer); each bucket is one running-sum window partition. At
    100 TB raise the bucket count to the executor count — the rule is
    deterministic per bucket, so resharding never changes assignments
    within a bucket.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.withColumn("cum", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "bucket",
            "n_tok",
            F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_CAP))
            .cast("bigint")
            .alias("seq_id"),
        )
        .orderBy("doc_id")
    )
