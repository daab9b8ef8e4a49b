"""Thirty-sixth sweep (SURVEY.md §2 B70–B71, C97).

BM25 corpus ranking over the inverted-index shape, incremental
maintenance of a JOIN view (the delta-algebra complement of A39's
aggregate IVM), and the unpivot/melt reshape surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import hash64, sql_tokens, tokens
from ..operators.snapshot import monday_of
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C97

BM25_QUERY = ("spark", "hash", "join")  # the query — literal spec
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    k1, b = BM25_K1, BM25_B
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
),
dl AS (
  SELECT doc_id, len(list_filter({sql_tokens('text')}, t -> t <> ''))
           AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(dl) * 1.0 / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE term IN ({terms}) GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({k1!r} + 1.0))
           / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / s.avgdl))
           * 1e6) AS BIGINT) AS sn
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, {sql_round('SUM(sn) / 1e6', 4)} AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 100
"""


@register("bm25_ranking", oracle=_bm25_oracle())
def bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus against a fixed query — the lexical
    side of the retrieval stack (C37 builds the index; C74 reranks;
    hybrid_search_rrf fuses) with the Robertson/Lucene idf.

    Scale shape: the token stream is filtered to the |Q| query terms
    BEFORE the (doc, term) aggregate, so the only corpus-volume
    shuffle carries query-term hits only; document length is computed
    arithmetically per doc (no second explode); df is a |Q|-row frame
    and the corpus stats a 1-row frame, both broadcast back. Per-term
    partial scores are quantised to integer micro-units so the
    per-doc sum is exact bigint math in any order, then top-100.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dl = docs.select(
        "doc_id",
        F.size(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    sn = F.round(
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        * 1e6
    ).cast("bigint")
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats), how="cross")
        .select("doc_id", sn.alias("sn"))
        .groupBy("doc_id")
        .agg(round_eps(F.sum("sn") / 1e6, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------- B70

IVM_MOD = 8  # md5-bucket-0 slice = "the new batch" (A39's convention)


def _ivm_rev_sql(ep: str, disc: str) -> str:
    """Revenue in exact 1e-4 units: cents × (100 − pct) — bigint."""
    return (
        f"CAST(ROUND({ep} * 100) AS BIGINT)"
        f" * (100 - CAST(ROUND({disc} * 100) AS BIGINT))"
    )


_B70_ORACLE = f"""
SELECT strftime(date_trunc('week', o.o_orderdate)::DATE, '%Y-%m-%d') AS week,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_round(
           "SUM(" + _ivm_rev_sql('l.l_extendedprice', 'l.l_discount')
           + ") / 1e4", 2)} AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1 ORDER BY 1
"""


@register("incremental_join_view", oracle=_B70_ORACLE)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta algebra
    (O∪ΔO)⋈(L∪ΔL) = O⋈L + ΔO⋈L + O⋈ΔL + ΔO⋈ΔL — on the weekly
    order-line revenue view. A39 maintains an AGGREGATE incrementally;
    this maintains the join itself: at refresh time only the three
    delta terms touch data (ΔO⋈L and O⋈ΔL are delta-sized probe
    joins; ΔO⋈ΔL is tiny), while the stored O⋈L term is the view's
    previous state (recomputed here only so the oracle can be the
    plain full join).

    Deltas are deterministic md5-bucket-0 slices (orders by orderkey,
    lineitems by (orderkey, linenumber) — independent keys so every
    cross term is non-empty). Revenue accumulates in exact 1e-4
    integer units (cents × integer pct), so the four partial
    aggregates merge with no FP-order sensitivity.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        monday_of(F.col("o_orderdate")).alias("week"),
        (hash64(F.col("o_orderkey").cast("string")) % IVM_MOD == 0).alias("is_d"),
    )
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).alias("rev")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        rev,
        (
            hash64(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("-"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % IVM_MOD
            == 0
        ).alias("is_d"),
    )
    # The four delta terms (O⋈L, ΔO⋈L, O⋈ΔL, ΔO⋈ΔL) partition the
    # full join EXACTLY (the is_d flags are disjoint slices), so they
    # are computed as the four grouping cells of ONE join instead of
    # four joins that each re-scanned — and re-md5'd — both tables:
    # per-term partials aggregate at (week, is_d_o, is_d_l) grain,
    # then merge by the same delta algebra (plain +, exact 1e-4
    # integer units). Plan cost drops from 8 table scans + 4 shuffles
    # to 2 scans + 1 shuffle; the term partials a real IVM refresh
    # would persist are still individually present pre-merge.
    merged = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("week", o.is_d, li.is_d)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("r"))
        .groupBy("week")
        .agg(F.sum("n").alias("n_lines"), F.sum("r").alias("rtot"))
    )
    return merged.select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "n_lines",
        round_eps(F.col("rtot") / 1e4, 2).alias("revenue"),
    ).orderBy("week")


# ---------------------------------------------------------------- B71

UNPIVOT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_B71_ORACLE = f"""
WITH long AS (
  {" UNION ALL ".join(
      f"SELECT '{c}' AS metric, CAST(ROUND({c} * 100) AS BIGINT) AS cents"
      f" FROM lineitem"
      for c in UNPIVOT_COLS)}
)
SELECT metric,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_round('SUM(cents) / 100.0', 2)} AS total,
       {sql_round('SUM(cents) / 100.0 / COUNT(*)', 4)} AS mean
FROM long GROUP BY metric ORDER BY metric
"""


@register("lineitem_unpivot_metrics", oracle=_B71_ORACLE)
def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via the DataFrame unpivot (melt) API plus a
    per-metric profile — the tidy-reshape surface every metrics
    pipeline needs (the reference reshapes indicator frames in pandas,
    flows/aggregate/common.py). The unpivot is a zero-shuffle Expand
    (each row emits |metrics| rows map-side); the only shuffle is the
    4-group aggregate, accumulated in exact integer cents.
    """
    li = load_table(spark, sf_dir, "lineitem").select(*UNPIVOT_COLS)
    long = li.unpivot([], list(UNPIVOT_COLS), "metric", "v").select(
        "metric", F.round(F.col("v") * 100).cast("bigint").alias("cents")
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_eps(F.sum("cents") / 100.0, 2).alias("total"),
            round_eps(F.sum("cents") / 100.0 / F.count(F.lit(1)), 4).alias("mean"),
        )
        .orderBy("metric")
    )
