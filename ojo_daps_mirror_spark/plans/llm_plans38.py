"""Thirty-eighth sweep (SURVEY.md §2 C98–C99, B76–B77).

BPE encode-apply (completing the C91 train loop with the inference
pass), normalization-canonicalised exact dedup, the feature-hashing
trick, and leave-one-out target encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_hash64, sql_tokens, tokens
from ..operators.lineage import cut_lineage
from ..sources import load_table
from . import register
from .llm_plans32 import (
    BPE_MERGES,
    _spark_merge_fold,
    _sql_merge_fold,
)

# ---------------------------------------------------------------- C98


def _c98_oracle() -> str:
    """Replay the C91 training CTE chain, then JOIN docs back onto the
    final vocab to score encoded lengths at document grain."""
    sql = f"""
WITH w0 AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({sql_tokens('text')}) AS tok FROM documents)
  WHERE tok <> '' GROUP BY tok
),
words0 AS (
  SELECT word, cnt,
         list_transform(generate_series(1, length(word)),
                        i -> substr(word, i, 1)) AS seq
  FROM w0
),
"""
    for i in range(BPE_MERGES):
        merged = _sql_merge_fold("w.seq", "t.x", "t.y")
        sql += f"""pairs{i} AS (
  SELECT w.cnt, w.seq[u.i] AS x, w.seq[u.i + 1] AS y
  FROM words{i} w, unnest(generate_series(1, len(w.seq) - 1)) AS u(i)
),
top{i} AS (
  SELECT x, y FROM pairs{i}
  GROUP BY x, y ORDER BY SUM(cnt) DESC, x, y LIMIT 1
),
words{i + 1} AS (
  SELECT w.word, w.cnt,
         CASE WHEN len(w.seq) < 2 THEN w.seq ELSE {merged} END AS seq
  FROM words{i} w CROSS JOIN top{i} t
),
"""
    return sql + f"""vocab AS (
  SELECT word, CAST(len(seq) AS BIGINT) AS n_sym,
         CAST(length(word) AS BIGINT) AS n_chr
  FROM words{BPE_MERGES}
),
doc_words AS (
  SELECT doc_id, tok AS word
  FROM (SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents)
  WHERE tok <> ''
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_chr) AS BIGINT) AS n_chars,
       CAST(SUM(v.n_sym) AS BIGINT) AS n_symbols,
       {sql_round('SUM(v.n_sym) * 1.0 / SUM(v.n_chr)', 4)} AS sym_per_char
FROM doc_words d JOIN vocab v USING (word)
GROUP BY d.doc_id ORDER BY d.doc_id
"""


@register("bpe_encode_apply", oracle=_c98_oracle())
def bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE: apply the {BPE_MERGES} merges learned by
    the C91 trainer to every document and report encoded lengths —
    train→apply is the full tokenizer loop every corpus pipeline runs
    (the apply pass is the one that touches all 100 TB).

    Scale shape: the merge rules live in the WORD-grain vocab frame
    (the same one the trainer maintains), so the corpus-scale pass is
    ONE doc-word explode + a hash join against the vocab (broadcast
    at test SF, shuffle join at web scale) + a doc-grain aggregate.
    Documents never run the merge fold themselves — encoding a word
    is a lookup, which is exactly how production tokenizers amortise
    (the merge fold runs |vocab| times, not |corpus| times).
    """
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "seq",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
        )
        .transform(cut_lineage)
    )
    for _ in range(BPE_MERGES):
        pair_struct = F.expr(
            "CASE WHEN size(seq) < 2 THEN "
            "CAST(array() AS array<struct<x: string, y: string>>) "
            "ELSE transform(sequence(1, size(seq) - 1), "
            "i -> struct(element_at(seq, i) AS x, element_at(seq, i + 1) AS y)) END"
        )
        top = (
            words.select("cnt", F.explode(pair_struct).alias("p"))
            .groupBy("p.x", "p.y")
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "x", "y")
            .limit(1)
            .collect()[0]
        )
        words = words.withColumn(
            "seq",
            F.when(F.size("seq") < 2, F.col("seq")).otherwise(
                _spark_merge_fold(F.col("seq"), top["x"], top["y"])
            ),
        ).transform(cut_lineage)
    vocab = words.select(
        "word",
        F.size("seq").cast("bigint").alias("n_sym"),
        F.length("word").cast("bigint").alias("n_chr"),
    )
    doc_words = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chr").alias("n_chars"),
            F.sum("n_sym").alias("n_symbols"),
            round_eps(F.sum("n_sym") * 1.0 / F.sum("n_chr"), 4).alias(
                "sym_per_char"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C99

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
)


_C99_ORACLE = f"""
WITH canon AS (
  SELECT doc_id, md5({_NORM_SQL}) AS norm_key FROM documents
)
SELECT doc_id, norm_key,
       MIN(doc_id) OVER (PARTITION BY norm_key) AS exemplar_id,
       COUNT(*) OVER (PARTITION BY norm_key) AS group_size,
       doc_id <> MIN(doc_id) OVER (PARTITION BY norm_key) AS is_duplicate
FROM canon ORDER BY doc_id
"""


@register("dedup_normalized", oracle=_C99_ORACLE)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalisation-canonicalised exact dedup: lowercase, strip
    non-alphanumerics, collapse whitespace, THEN md5-group — catches
    the trivial-reformat duplicates (case, punctuation, spacing) that
    raw-hash dedup_exact (A10) misses; the standard first pass before
    MinHash in corpus dedup stacks.

    Scale shape: canonicalisation is pure codegen string ops map-side;
    grouping is one window over the 128-bit key — identical cost
    profile to A10, so everything said there about 100 TB holds.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm).alias("norm_key")
    )
    w = Window.partitionBy("norm_key")
    return docs.select(
        "doc_id",
        "norm_key",
        F.min("doc_id").over(w).alias("exemplar_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_duplicate"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- B76

FH_BUCKETS = 32  # 2^5 hashed feature space


_B76_ORACLE = f"""
WITH feats AS (
  SELECT c_custkey, 'seg:' || c_mktsegment AS f FROM customer
  UNION ALL
  SELECT c_custkey, 'nat:' || c_nationkey::VARCHAR AS f FROM customer
),
hashed AS (
  SELECT ({sql_hash64('f')}) % {FH_BUCKETS} AS bucket,
         CASE WHEN (({sql_hash64("f || '#'")}) % 2) = 0 THEN 1 ELSE -1 END
           AS sign
  FROM feats
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(sign) AS BIGINT) AS signed_sum
FROM hashed GROUP BY bucket ORDER BY bucket
"""


@register("feature_hashing", oracle=_B76_ORACLE)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): categorical
    features hashed into a fixed {FH_BUCKETS}-bucket space with a
    second sign hash (the collision-debiasing trick) — how unbounded
    categorical vocabularies become fixed-width model inputs without
    a fitted vocabulary (no state to ship, reshard-stable).

    Scale shape: feature expansion is a map-side unpivot (2 rows per
    customer), hashing pure codegen, ONE {FH_BUCKETS}-group aggregate
    with map-side combine. Integer signed sums — exact in any order.
    """
    cust = load_table(spark, sf_dir, "customer")
    feats = cust.select(
        F.concat(F.lit("seg:"), F.col("c_mktsegment")).alias("f")
    ).unionByName(
        cust.select(
            F.concat(F.lit("nat:"), F.col("c_nationkey").cast("string")).alias("f")
        )
    )
    hashed = feats.select(
        (hash64(F.col("f")) % FH_BUCKETS).alias("bucket"),
        F.when(
            hash64(F.concat(F.col("f"), F.lit("#"))) % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sign").cast("bigint").alias("signed_sum"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- B77

_B77_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
enc AS (
  SELECT o_orderkey, cat,
         SUM(cents) OVER (PARTITION BY cat) AS s,
         COUNT(*) OVER (PARTITION BY cat) AS n,
         cents
  FROM base
)
SELECT o_orderkey, cat,
       {sql_round('(s - cents) * 1.0 / (n - 1) / 100.0', 4)} AS loo_mean
FROM enc WHERE n > 1 ORDER BY o_orderkey
"""


@register("target_encoding_loo", oracle=_B77_ORACLE)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature is
    the mean target of OTHER rows in its category, (Σ_cat − y_i)/(n−1)
    — the leakage-safe categorical encoder (plain category means leak
    each row's own label into its feature).

    Scale shape: two unpartitioned-window-free aggregates per category
    via windows PARTITIONED by the category (distributes on the
    category key; skewed categories are one AQE skew split away);
    target sums in exact integer cents so the subtraction is exact,
    with one division at the end.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("cat")
    return (
        base.select(
            "o_orderkey",
            "cat",
            F.sum("cents").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
            "cents",
        )
        .where(F.col("n") > 1)
        .select(
            "o_orderkey",
            "cat",
            round_eps(
                (F.col("s") - F.col("cents")) * 1.0 / (F.col("n") - 1) / 100.0, 4
            ).alias("loo_mean"),
        )
        .orderBy("o_orderkey")
    )
