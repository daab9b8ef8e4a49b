"""Training-data pipeline plans, second sweep (SURVEY.md §2.C17–C20).

Operators a 100 TB pre-training corpus pipeline needs beyond dedup/ANN:
Gopher-style repetition/quality signals, benchmark decontamination,
deterministic stratified sampling, and PII scrubbing. None exist in the
reference (its corpus is job ads); all are standard LLM-corpus stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps
from ..functions.text import shingles, sql_shingles, sql_tokens, tokens
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C17

TOP_TOKEN_FRAC_MAX = 0.2
DUP_TOKEN_FRAC_MAX = 0.8
MIN_DOC_TOKENS = 20

_C17_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens("lower(text)")}) AS tok FROM documents
),
tc AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
),
rep AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         MAX(c) AS max_c,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_c
  FROM tc GROUP BY doc_id
),
chars AS (
  SELECT doc_id,
         length(text) AS n_chars_t,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
           AS n_symbols
  FROM documents
)
SELECT r.doc_id,
       r.n_tokens,
       ROUND(r.max_c * 1.0 / r.n_tokens + 1e-9, 4) AS top_token_frac,
       ROUND(r.dup_c * 1.0 / r.n_tokens + 1e-9, 4) AS dup_token_frac,
       ROUND(c.n_symbols * 1.0 / c.n_chars_t + 1e-9, 4) AS symbol_ratio,
       CASE WHEN r.max_c * 1.0 / r.n_tokens <= {TOP_TOKEN_FRAC_MAX}
                 AND r.dup_c * 1.0 / r.n_tokens <= {DUP_TOKEN_FRAC_MAX}
                 AND r.n_tokens >= {MIN_DOC_TOKENS}
            THEN 1 ELSE 0 END AS passes
FROM rep r JOIN chars c USING (doc_id)
ORDER BY doc_id
"""


@register("quality_gopher", oracle=_C17_ORACLE)
def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition + symbol quality signals per document.

    Rahm-style corpus filters (Gopher / MassiveText, Rae et al. 2021
    §A.1.1): fraction of tokens taken by the most frequent token,
    fraction of tokens that are repeats, symbol-to-char ratio, and a
    composite pass flag. The reference has no analog; this is the
    quality gate a pre-training pipeline runs before dedup.

    Scale shape: one explode + (doc, token) groupBy with map-side
    combine, re-aggregated to doc grain; char-level ratios ride the
    same scan as pure expressions. The (doc, token) shuffle is the cost
    — proportional to corpus tokens, the floor for exact mode counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("max_c"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_c"),
    )
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_t"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
        ).alias("n_symbols"),
    )
    out = rep.join(chars, "doc_id")
    top_frac = F.col("max_c") / F.col("n_tokens")
    dup_frac = F.col("dup_c") / F.col("n_tokens")
    return out.select(
        "doc_id",
        "n_tokens",
        round_eps(top_frac, 4).alias("top_token_frac"),
        round_eps(dup_frac, 4).alias("dup_token_frac"),
        round_eps(F.col("n_symbols") / F.col("n_chars_t"), 4).alias("symbol_ratio"),
        F.when(
            (top_frac <= TOP_TOKEN_FRAC_MAX)
            & (dup_frac <= DUP_TOKEN_FRAC_MAX)
            & (F.col("n_tokens") >= MIN_DOC_TOKENS),
            1,
        )
        .otherwise(0)
        .alias("passes"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C18

DECON_SHINGLE_K = 3
BENCH_MOD = 50  # doc_id % 50 == 0 plays the held-out benchmark set

_C18_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({sql_shingles(sql_tokens("text"), DECON_SHINGLE_K)}) AS s
  FROM documents
),
bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0
),
hits AS (
  SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_hit_shingles
  FROM sh JOIN bench USING (s)
  WHERE sh.doc_id % {BENCH_MOD} <> 0
  GROUP BY sh.doc_id
)
SELECT doc_id, n_hit_shingles FROM hits ORDER BY doc_id
"""


@register("decontaminate_ngram", oracle=_C18_ORACLE)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by n-gram overlap.

    Flags training documents sharing any {k}-gram with the held-out
    benchmark slice (doc_id % 50 == 0) — the GPT-3/PaLM-style test-set
    overlap check run before training. Returns contaminated doc ids
    with the count of distinct overlapping shingles.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (benchmarks are ~10⁵ docs vs ~10⁹), so it is broadcast and
    the corpus side never shuffles for the join; per-doc hit counts
    aggregate map-side. If the benchmark outgrew broadcast, the same
    plan shuffle-joins on the shingle hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), DECON_SHINGLE_K)).alias("s"),
    )
    bench = (
        sh.where(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    )
    return (
        sh.where(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_hit_shingles"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C19

SAMPLE_RATES = {"en": 60, "fr": 35, "de": 35, "es": 20, "zh": 20}
DEFAULT_RATE = 10

_rate_case = " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
)

_C19_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, lang,
         CASE {_rate_case} ELSE {DEFAULT_RATE} END AS rate,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket FROM rated WHERE bucket < rate ORDER BY doc_id
"""


@register("stratified_sample", oracle=_C19_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (language) downsampling.

    Corpus mixing: each language keeps an independent fraction, decided
    by a content-derived hash bucket (md5 of the id), not rand() — so
    the sample is reproducible across runs/engines and stable under
    re-partitioning. This is the map-only way to hit a target language
    mix over 100 TB: no shuffle, no sampling pass, the filter rides the
    scan (and combines with parquet predicate pushdown on lang).
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_RATE)
    for k, v in reversed(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate"))
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C20

_NUM_PAT = "[0-9]{2,}"

_C20_ORACLE = f"""
SELECT event_id,
       regexp_replace(props, '{_NUM_PAT}', '<NUM>', 'g') AS scrubbed,
       len(regexp_extract_all(props, '{_NUM_PAT}')) AS n_redactions
FROM events
ORDER BY event_id
"""


@register("pii_scrub", oracle=_C20_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII/number redaction with audit counts.

    The standard pre-training scrub stage: replace sensitive patterns
    (here: digit runs in the event payload; emails/phones/URLs are the
    same regexp_replace shape) with typed placeholder tokens, and count
    redactions per record for the audit trail. Pure codegen expressions
    — a map-only pass at any scale; regexp_count keeps the audit in the
    same scan as the rewrite.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.regexp_replace("props", _NUM_PAT, "<NUM>").alias("scrubbed"),
        F.regexp_count("props", F.lit(_NUM_PAT)).alias("n_redactions"),
    ).orderBy("event_id")


# ---------------------------------------------------------------- C30

ENCODE_PREVIEW = 32  # ids serialised per doc (hash-stable CSV preview)

_C30_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
pos AS (
  SELECT doc_id, i, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
vocab AS (
  SELECT tok,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) - 1 AS tid
  FROM pos GROUP BY tok
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       string_agg(v.tid::VARCHAR, ',' ORDER BY p.i)
         FILTER (WHERE p.i <= {ENCODE_PREVIEW}) AS ids_csv
FROM pos p JOIN vocab v USING (tok)
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


@register("vocab_encode", oracle=_C30_ORACLE)
def vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build + document id-encoding — the
    tokenise-to-ids stage in front of any training batcher: token id =
    frequency rank (deterministic ties by token), every document
    re-emitted as its id sequence.

    Scale shape: the vocab is a (token, rank) frame — the global rank
    window is a single-partition sort over the DISTINCT vocabulary
    (bounded by language, not corpus; the same driver-sized assumption
    every tokeniser-training step makes), then broadcast onto the
    posexploded token stream; re-assembly is ONE groupBy(doc_id) with
    a sorted collect over (pos, id) structs. The serialised output is
    a CSV preview of the first ENCODE_PREVIEW ids so the cross-engine
    value-hash compares strings, not array formatting.
    """
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("i", "tok")
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    vocab = (
        pos.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("tid", F.row_number().over(w) - 1)
        .select("tok", "tid")
    )
    enc = (
        pos.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("i") < ENCODE_PREVIEW,
                        F.struct("i", "tid"),
                    )
                )
            ).alias("head"),
        )
    )
    ids_csv = F.array_join(
        F.transform(F.col("head"), lambda s: s.getField("tid").cast("string")),
        ",",
    )
    return enc.select(
        "doc_id", "n_tokens", ids_csv.alias("ids_csv")
    ).orderBy("doc_id")
