"""Twenty-third sweep (SURVEY.md §2 C82).

Readability scoring (Flesch reading ease / Flesch–Kincaid grade) as
pure codegen string expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C82

# syllable heuristic: runs of vowels within a word ≈ one syllable each;
# every word counts at least one. Deterministic and cheap — the point
# is the quality-signal plumbing, not linguistic exactness.
_VOWEL_RUN = "[aeiouy]+"
_SENT_SPLIT = "[.!?]+"

_C82_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         GREATEST(len(regexp_extract_all(lower(text), '{_VOWEL_RUN}')), 1)
           AS syllables,
         GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) AS words,
         GREATEST(len(list_filter(
             string_split_regex(text, '{_SENT_SPLIT}'),
             s -> trim(s) <> '')), 1) AS sentences
  FROM documents
)
SELECT doc_id, CAST(words AS BIGINT) AS words,
       CAST(sentences AS BIGINT) AS sentences,
       CAST(syllables AS BIGINT) AS syllables,
       {sql_round(
           '206.835 - 1.015 * (words * 1.0 / sentences)'
           ' - 84.6 * (syllables * 1.0 / words)', 4)} AS flesch_ease,
       {sql_round(
           '0.39 * (words * 1.0 / sentences)'
           ' + 11.8 * (syllables * 1.0 / words) - 15.59', 4)} AS fk_grade
FROM base ORDER BY doc_id
"""


@register("readability_scores", oracle=_C82_ORACLE)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    classic readability quality signal (a standard column next to C2's
    composite and C17's Gopher filters in corpus-quality stacks).

    Counting is entirely codegen string work: words = whitespace
    splits, sentences = non-empty [.!?] segments, syllables = vowel-run
    occurrences (the standard cheap heuristic; every count floors at 1
    so the ratios are total). ZERO shuffles beyond the presentation
    sort — identical regex semantics in the DuckDB oracle.
    """
    text = F.col("text")
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower(text), F.lit(_VOWEL_RUN), 0)),
        F.lit(1),
    )
    words = F.greatest(F.size(F.split(F.trim(text), r"\s+")), F.lit(1))
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(text, _SENT_SPLIT), lambda s: F.trim(s) != ""
            )
        ),
        F.lit(1),
    )
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        syllables.alias("syllables"),
        words.alias("words"),
        sentences.alias("sentences"),
    )
    wps = F.col("words") / F.col("sentences")
    spw = F.col("syllables") / F.col("words")
    return base.select(
        "doc_id",
        F.col("words").cast("bigint").alias("words"),
        F.col("sentences").cast("bigint").alias("sentences"),
        F.col("syllables").cast("bigint").alias("syllables"),
        round_eps(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_ease"),
        round_eps(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    ).orderBy("doc_id")
