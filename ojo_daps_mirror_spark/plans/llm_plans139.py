"""Hundred-thirty-ninth sweep (SURVEY.md §2 C226).

Exact-substring dedup spans (Lee et al. 2022, 'Deduplicating Training
Data Makes Language Models Better', ExactSubstr): per document, the
merged character ranges whose content occurs elsewhere in the corpus
(including elsewhere in the same document) — the byte-range removal
decision that sits between document-level dedup (A10/C5) and the
span-naming audit (C207 suffix_lcp_boilerplate, which reports the top
offending strings; this op prices and localises EVERY document's
duplicated mass).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.suffix import adjacent_suffixes
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C226

ESD_CAP = 48  # suffix window: span detection exact up to this length
ESD_MIN = 24  # minimum duplicated run worth excising

_IVT = "array<struct<s:bigint,e:bigint>>"

_SPAN_CTES = f"""
WITH sufs AS (
  SELECT doc_id, p, len(text) AS n, substr(text, p, {ESD_CAP}) AS suf
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(text))) AS p)
),
ordered AS (
  SELECT doc_id, p, n, suf,
         lag(doc_id) OVER w AS pd, lag(p) OVER w AS pp,
         lag(n) OVER w AS pn, lag(suf) OVER w AS ps
  FROM sufs WINDOW w AS (ORDER BY suf, doc_id, p)
),
pairs AS (
  SELECT doc_id, p, n, pd, pp, pn,
         len(list_filter(generate_series(1, {ESD_CAP}),
             L -> substr(suf, 1, L) = substr(ps, 1, L))) AS lcp
  FROM ordered WHERE ps IS NOT NULL
),
contrib AS (
  SELECT doc_id, p, n, lcp FROM pairs
  UNION ALL
  SELECT pd AS doc_id, pp AS p, pn AS n, lcp FROM pairs
),
dups AS (
  SELECT doc_id, CAST(p AS BIGINT) AS s,
         CAST(p + LEAST(MAX(lcp), n - p + 1) AS BIGINT) AS e
  FROM contrib GROUP BY doc_id, p, n
  HAVING LEAST(MAX(lcp), n - p + 1) >= {ESD_MIN}
),
merged AS (
  SELECT doc_id,
         list_reduce(
           list_transform(list_sort(list({{'s': s, 'e': e}})), i -> [i]),
           (a, b) -> CASE WHEN b[1].s <= a[-1].e
             THEN list_slice(a, 1, len(a) - 1)
                  || [{{'s': a[-1].s, 'e': greatest(a[-1].e, b[1].e)}}]
             ELSE a || b END
         ) AS miv
  FROM dups GROUP BY doc_id
)
"""

_C226_ORACLE = f"""{_SPAN_CTES}
SELECT d.doc_id,
       CAST(len(d.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(len(miv), 0) AS BIGINT) AS dup_spans,
       CAST(COALESCE(list_sum(list_transform(miv, x -> x.e - x.s)), 0)
            AS BIGINT) AS dup_chars,
       CAST(len(d.text)
            - COALESCE(list_sum(list_transform(miv, x -> x.e - x.s)), 0)
            AS BIGINT) AS clean_chars,
       COALESCE(array_to_string(list_transform(miv,
                x -> x.s::VARCHAR || '-' || x.e::VARCHAR), ';'), '')
         AS spans
FROM documents d LEFT JOIN merged USING (doc_id)
ORDER BY d.doc_id
"""


# Merged-intervals stage version: bump when the interval recipe or
# schema changes so a shared-dir stage from older code is never misread.
_MERGED_STAGE_VERSION = 1


def _build_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc-grain merged duplicate intervals (doc_id, miv) — the
    ExactSubstr decision table behind C226/C227/C228.

    A position's longest match with ANY other suffix is the max of its
    two sort-neighbour LCPs — both materialized IN the suffix stage
    (lcp + the v3 nlcp column), so the per-position duplicated length
    is a plain row expression (greatest skips NULLs, exactly matching
    the old union + per-(doc, p) MAX aggregate over present
    neighbours), and the ONLY shuffle left is the doc-grain interval
    collect over the few positions that pass the >= ESD_MIN filter.
    The corpus-chars-grain union + (doc_id, p, n) groupBy each
    consumer used to re-pay is gone entirely."""
    ordered = adjacent_suffixes(spark, sf_dir, ESD_CAP)
    true_len = F.least(
        F.greatest("lcp", "nlcp"), F.col("n") - F.col("p") + 1
    )
    dups = (
        ordered.select("doc_id", "p", "n", "lcp", "nlcp")
        .withColumn("dl", true_len)
        .where(F.col("dl") >= ESD_MIN)
        .select(
            "doc_id",
            F.col("p").alias("s"),
            (F.col("p") + F.col("dl")).cast("bigint").alias("e"),
        )
    )
    return (
        dups.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("iv"))
        .select(
            "doc_id",
            F.aggregate(
                "iv",
                F.expr(f"CAST(array() AS {_IVT})"),
                lambda acc, x: F.when(F.size(acc) == 0, F.array(x)).otherwise(
                    F.when(
                        x["s"] <= F.element_at(acc, -1)["e"],
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(
                                F.struct(
                                    F.element_at(acc, -1)["s"].alias("s"),
                                    F.greatest(
                                        F.element_at(acc, -1)["e"], x["e"]
                                    ).alias("e"),
                                )
                            ),
                        ),
                    ).otherwise(F.concat(acc, F.array(x)))
                ),
            ).alias("miv"),
        )
    )


def _merged_spans(spark: SparkSession, sf_dir: str):
    """(docs, merged-intervals) — the shared ExactSubstr detection
    pipeline behind C226 (span report), C227 (text excision) and C228
    (the yield waterfall). The sorted lag-adjacent suffix frame comes
    from the session-cached operators/suffix.py producer, and the
    doc-grain merged-intervals table itself is a materialized family
    stage (operators/stagecache.py) on top of it: the trio reads ONE
    finished (doc_id, miv) parquet part per session instead of each
    re-aggregating corpus-chars-grain rows — at 100 TB this is the
    span-decision table a Lee-et-al pipeline keeps in the lake next to
    the suffix array, consumed by the report, the excision and the
    yield accounting alike."""
    from ..operators.stagecache import input_fingerprint, materialized_stage
    from ..operators.suffix import resolved_stride

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stride = resolved_stride(None, sf_dir, ESD_CAP)
    key = "|".join(
        (
            sf_dir,
            f"cap{ESD_CAP}",
            f"min{ESD_MIN}",
            f"s{stride}",
            input_fingerprint(os.path.join(sf_dir, "documents.parquet")),
        )
    )
    stage = materialized_stage(
        spark,
        "exactsubstr",
        _MERGED_STAGE_VERSION,
        key,
        [("merged", lambda parts: _build_merged(spark, sf_dir))],
    )
    return docs, stage["merged"]


@register("dedup_substring_spans", oracle=_C226_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup spans (Lee et al. 2022): for every document,
    the merged char ranges [s, e) whose content also occurs elsewhere
    in the corpus for >= {ESD_MIN} chars — the removal decision an
    LLM-corpus pipeline applies before training (the excision itself
    is then a trivial per-doc substring map over `spans`). Detection
    is the suffix-sort adjacency trick: in suffix order, a suffix's
    longest match with ANY other suffix is the max of its two
    neighbour LCPs, so one sharded sort prices every position with no
    pairwise comparison; runs longer than the {ESD_CAP}-char window
    are recovered exactly by the per-document interval merge of
    overlapping per-position windows.

    Exactness: positions, clamped LCPs (min(lcp, chars remaining) —
    equal SHORT suffixes saturate the window probe, so the clamp is
    what keeps spans inside the document) and interval merges are
    pure integer set algebra, identical in both engines; `spans`
    serialises the merged intervals canonically.

    Scale shape: |corpus chars| capped-suffix rows through ONE
    range-partitioned sort (operators/rank.py attach_prev: pid-local
    lag + one boundary row per shard), map-side LCPs, a (doc, pos)
    aggregate, and a doc-grain interval fold — no all-pairs join, no
    single-reducer stage, no driver state.
    """
    docs, merged = _merged_spans(spark, sf_dir)
    dup_chars = F.aggregate(
        "miv", F.lit(0).cast("bigint"), lambda a, x: a + (x["e"] - x["s"])
    )
    return (
        docs.join(merged, "doc_id", "left")
        .select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_chars"),
            F.coalesce(F.size("miv"), F.lit(0)).cast("bigint").alias(
                "dup_spans"
            ),
            F.coalesce(dup_chars, F.lit(0)).cast("bigint").alias("dup_chars"),
            (
                F.length("text").cast("bigint")
                - F.coalesce(dup_chars, F.lit(0))
            ).cast("bigint").alias("clean_chars"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        "miv",
                        lambda x: F.concat(
                            x["s"].cast("string"),
                            F.lit("-"),
                            x["e"].cast("string"),
                        ),
                    ),
                    ";",
                ),
                F.lit(""),
            ).alias("spans"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C227

_CLEAN_CTE = f"""
clean AS (
  SELECT d.doc_id,
         CAST(len(d.text) AS BIGINT) AS n_chars,
         CASE WHEN miv IS NULL THEN d.text
              -- kept text = the gaps between merged intervals plus the
              -- tail. Built with an INDEXED transform, not list_reduce:
              -- DuckDB 1.0 mis-binds outer-column references inside a
              -- reduce lambda (the accumulator cursor reads corrupt),
              -- while plain transforms bind correctly.
              ELSE array_to_string(
                     list_transform(
                       generate_series(1, len(miv)),
                       k -> substr(d.text,
                                   CASE WHEN k = 1 THEN 1
                                        ELSE miv[k - 1].e END,
                                   miv[k].s
                                   - CASE WHEN k = 1 THEN 1
                                          ELSE miv[k - 1].e END)
                     ), '')
                   || substr(d.text, miv[-1].e,
                             len(d.text) - miv[-1].e + 1)
         END AS clean_text
  FROM documents d LEFT JOIN merged USING (doc_id)
)
"""

_C227_ORACLE = f"""{_SPAN_CTES},{_CLEAN_CTE}
SELECT doc_id, n_chars,
       CAST(len(clean_text) AS BIGINT) AS clean_chars,
       CAST(n_chars - len(clean_text) AS BIGINT) AS removed_chars,
       clean_text
FROM clean ORDER BY doc_id
"""


@register("dedup_substring_excise", oracle=_C227_ORACLE)
def dedup_substring_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr APPLIED: the cleaned corpus after excising C226's
    merged duplicated spans — the actual training-data output of the
    Lee et al. pipeline, not just the decision. The surgery is one
    per-document fold over the merged intervals (cursor + kept-text
    accumulator built from dynamic substrings), so documents without
    duplicated spans pass through byte-identical.

    Exactness: the fold consumes C226's exact integer intervals and
    concatenates the complementary substrings — both engines build the
    identical string; removed_chars equals C226's dup_chars by
    construction (asserted cross-op in tests).

    Scale shape: C226's detection cost (one range-partitioned suffix
    sort) plus a doc-grain join and a map-side fold whose state is one
    cursor and the kept text — nothing new shuffles.
    """
    docs, merged = _merged_spans(spark, sf_dir)
    text = F.col("text")
    miv = F.col("miv")
    prev_e = lambda i: F.when(i == 0, F.lit(1).cast("bigint")).otherwise(
        F.element_at(miv, i)["e"]
    )
    gaps = F.array_join(
        F.transform(
            miv,
            lambda x, i: text.substr(prev_e(i), x["s"] - prev_e(i)),
        ),
        "",
    )
    tail_start = F.element_at(miv, -1)["e"]
    cleaned = F.concat(
        gaps,
        text.substr(
            tail_start, F.length(text).cast("bigint") - tail_start + 1
        ),
    )
    return (
        docs.join(merged, "doc_id", "left")
        .select(
            "doc_id",
            F.length(text).cast("bigint").alias("n_chars"),
            F.when(miv.isNull(), text).otherwise(cleaned).alias(
                "clean_text"
            ),
        )
        .select(
            "doc_id",
            "n_chars",
            F.length("clean_text").cast("bigint").alias("clean_chars"),
            (F.col("n_chars") - F.length("clean_text"))
            .cast("bigint")
            .alias("removed_chars"),
            "clean_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C228

_C228_ORACLE = f"""{_SPAN_CTES},{_CLEAN_CTE},
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
tok AS (
  SELECT d.source,
         CAST(len(list_filter(__RAWTOK__, t -> t <> '')) AS BIGINT)
           AS raw_tk,
         CASE WHEN k.doc_id IS NOT NULL
              THEN CAST(len(list_filter(__RAWTOK__, t -> t <> '')) AS BIGINT)
              ELSE 0 END AS kept_tk,
         CAST(len(list_filter(__CLEANTOK__, t -> t <> '')) AS BIGINT)
           AS clean_tk
  FROM documents d
  JOIN clean c USING (doc_id)
  LEFT JOIN keepers k USING (doc_id)
)
SELECT source,
       CAST(SUM(raw_tk) AS BIGINT) AS raw_tokens,
       CAST(SUM(kept_tk) AS BIGINT) AS doc_dedup_tokens,
       CAST(SUM(clean_tk) AS BIGINT) AS span_dedup_tokens,
       __YIELD1__ AS doc_dedup_yield_pct,
       __YIELD2__ AS span_dedup_yield_pct
FROM tok GROUP BY source ORDER BY source
"""


def _c228_oracle() -> str:
    from ..functions.rounding import sql_round
    from ..functions.text import sql_tokens

    return (
        _C228_ORACLE
        .replace("__RAWTOK__", sql_tokens("d.text"))
        .replace("__CLEANTOK__", sql_tokens("c.clean_text"))
        .replace(
            "__YIELD1__",
            sql_round("SUM(kept_tk) * 100.0 / SUM(raw_tk)", 4),
        )
        .replace(
            "__YIELD2__",
            sql_round("SUM(clean_tk) * 100.0 / SUM(raw_tk)", 4),
        )
    )


@register("token_yield_waterfall", oracle=_c228_oracle())
def token_yield_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-training-token accounting per source: raw tokens, the
    tokens surviving exact document dedup (A10's min-id exemplar
    rule), and the tokens surviving ExactSubstr span excision (C227's
    cleaned text) — the data-yield waterfall a corpus owner reads
    before quoting 'we have N tokens'. dup_span_fraction (C24) prices
    hashed-shingle mass; this prices the EXACT pipelines' yield, per
    source, in actual tokens.

    Exactness: both dedup decisions are exact (md5 groups; C226's
    integer spans); token counts are integers; yields round at 4dp
    from identical integer ratios.

    Scale shape: C226's one suffix sort plus a doc-grain md5 groupBy
    and two map-side tokenizations — the aggregate is |sources| rows.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    clean = dedup_substring_excise(spark, sf_dir).select(
        "doc_id", "clean_text"
    )
    keepers = (
        docs.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("kept"))
    )

    def ntok(col):
        return F.size(F.filter(tokens(col), lambda t: t != "")).cast(
            "bigint"
        )

    tok = (
        docs.join(clean, "doc_id")
        .join(keepers, "doc_id", "left")
        .select(
            "source",
            ntok(F.col("text")).alias("raw_tk"),
            F.when(F.col("kept").isNotNull(), ntok(F.col("text")))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("kept_tk"),
            ntok(F.col("clean_text")).alias("clean_tk"),
        )
    )
    from ..functions.rounding import round_eps

    return (
        tok.groupBy("source")
        .agg(
            F.sum("raw_tk").cast("bigint").alias("raw_tokens"),
            F.sum("kept_tk").cast("bigint").alias("doc_dedup_tokens"),
            F.sum("clean_tk").cast("bigint").alias("span_dedup_tokens"),
            round_eps(
                F.sum("kept_tk") * 100.0 / F.sum("raw_tk"), 4
            ).alias("doc_dedup_yield_pct"),
            round_eps(
                F.sum("clean_tk") * 100.0 / F.sum("raw_tk"), 4
            ).alias("span_dedup_yield_pct"),
        )
        .orderBy("source")
    )
