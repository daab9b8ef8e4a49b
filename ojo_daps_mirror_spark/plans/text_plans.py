"""Text-analysis and text-dedup queries (SURVEY.md §2.C1–C7).

The training-data-pipeline operator family: token statistics, quality
scoring, language-ID, fingerprinting, and the three text near-dup
families (MinHash+LSH, SimHash, inverted-index n-gram Jaccard). The
reference's skills/text machinery (labs/skills/text_cleaning_utils.py,
skills_detection_utils.py) is driver-side spaCy/NLTK; everything here
is Catalyst array/string expressions — zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps
from ..functions.text import (
    LANG_PRIORITY,
    LANG_STOPWORDS,
    PUNCT_CLASS,
    STOPWORDS,
    hash64,
    shingles,
    spark_sql_hash64,
    spark_sql_shingles,
    spark_sql_tokens,
    sql_hash64,
    sql_shingles,
    sql_stopword_hits,
    sql_tokens,
    stopword_hits,
    tokens,
)
from ..sources import load_table
from . import register

BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# ---------------------------------------------------------------- C1

_C1_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens
FROM t ORDER BY doc_id
"""


@register("token_count", oracle=_C1_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C2

_C2_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents
), m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(toks) AS n_tokens,
         list_sum(list_transform(toks, s -> length(s))) * 1.0 / len(toks)
           AS mean_word_len,
         {sql_stopword_hits('toks')} * 1.0 / len(toks) AS stopword_ratio,
         len(regexp_extract_all(text, '{PUNCT_CLASS}')) * 1.0 / length(text)
           AS punct_ratio
  FROM t
)
SELECT doc_id, n_chars, n_tokens,
       ROUND(mean_word_len + 1e-9, 4) AS mean_word_len,
       ROUND(stopword_ratio + 1e-9, 4) AS stopword_ratio,
       ROUND(punct_ratio + 1e-9, 4) AS punct_ratio,
       ROUND(0.4 * stopword_ratio
             + 0.3 * least(mean_word_len / 10.0, 1.0)
             + 0.3 * (1.0 - punct_ratio) + 1e-9, 4) AS quality_score
FROM m ORDER BY doc_id
"""


@register("quality_score", oracle=_C2_ORACLE)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / punctuation composite quality score —
    the pre-training filter battery."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    mean_word_len = (
        F.aggregate(toks, F.lit(0), lambda acc, s: acc + F.length(s))
        * F.lit(1.0)
        / n_tokens
    )
    stop_ratio = stopword_hits(toks) * F.lit(1.0) / n_tokens
    punct_ratio = (
        F.regexp_count(F.col("text"), F.lit(PUNCT_CLASS))
        * F.lit(1.0)
        / F.length("text")
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        round_eps(mean_word_len, 4).alias("mean_word_len"),
        round_eps(stop_ratio, 4).alias("stopword_ratio"),
        round_eps(punct_ratio, 4).alias("punct_ratio"),
        round_eps(
            0.4 * stop_ratio
            + 0.3 * F.least(mean_word_len / 10.0, F.lit(1.0))
            + 0.3 * (1.0 - punct_ratio),
            4,
        ).alias("quality_score"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C3

_lang_scores_sql = ",\n         ".join(
    f"{sql_stopword_hits('toks', LANG_STOPWORDS[lang])} AS score_{lang}"
    for lang in LANG_PRIORITY
)

_C3_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, {sql_tokens('text')} AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
         {_lang_scores_sql}
  FROM t
)
SELECT doc_id, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en > 0
              THEN 'en'
            WHEN score_es >= score_de AND score_es > 0 THEN 'es'
            WHEN score_de > 0 THEN 'de'
            ELSE 'und' END AS pred_lang,
       (CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en > 0
              THEN 'en'
            WHEN score_es >= score_de AND score_es > 0 THEN 'es'
            WHEN score_de > 0 THEN 'de'
            ELSE 'und' END) = lang AS is_correct
FROM s ORDER BY doc_id
"""


@register("lang_id", oracle=_C3_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic with a deterministic
    priority-ordered argmax."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            stopword_hits(toks, LANG_STOPWORDS[lang]).alias(f"score_{lang}")
            for lang in LANG_PRIORITY
        ],
    )
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") > 0),
            "en",
        )
        .when((F.col("score_es") >= F.col("score_de")) & (F.col("score_es") > 0), "es")
        .when(F.col("score_de") > 0, "de")
        .otherwise("und")
    )
    return scored.select(
        "doc_id",
        "score_en",
        "score_es",
        "score_de",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C4

FP_SHINGLE_K = 5

_C4_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), FP_SHINGLE_K)} AS sh
  FROM documents
)
SELECT doc_id,
       len(sh) AS n_shingles,
       list_min(list_transform(sh, s -> {sql_hash64('s')})) AS min_fingerprint
FROM t ORDER BY doc_id
"""


@register("doc_fingerprint", oracle=_C4_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling shingle-hash document fingerprint (1-perm minhash /
    winnowing-lite): the cheap first-pass near-dup signal."""
    # Materialise tokens and the hashed-shingle array as BOUND
    # attributes (separate projections) before size/min read them:
    # the single-select form inlined the whole split+zip_with shingle
    # chain TWICE (once under size, once under transform) and split()
    # once per slice level inside each — 4.7 s min-of-3 at sf0.1 for a
    # map-only plan. tokens stays its own projection (referenced by
    # every slice level); the final select references hs twice so
    # CollapseProject leaves it bound.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    hashed = docs.select(
        "doc_id",
        F.transform(
            shingles(F.col("t"), FP_SHINGLE_K), lambda s: hash64(s)
        ).alias("hs"),
    )
    return hashed.select(
        "doc_id",
        F.size("hs").alias("n_shingles"),
        F.array_min("hs").alias("min_fingerprint"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- C5

MH_SHINGLE_K = 3
MH_PERMS = 8
MH_ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.5

# Affine minhash permutations over Z_p: one md5 per shingle, then
# MH_PERMS integer maps (a*h31 + b) mod p — 8× cheaper than hashing
# every (perm, shingle) combination, and exactly mirrorable in SQL.
MH_PRIME = 2147483647  # 2^31 - 1
MH_A = [1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121]
MH_B = [12345, 54321, 192837, 918273, 135791, 975313, 246802, 864209]
# Hot-bucket skew guard: a band bucket holding > MH_BUCKET_CAP docs is a
# degenerate boilerplate cluster — its O(n²) pair expansion would land in
# ONE task. Real near-dup groups collide in several bands, so dropping a
# giant bucket loses pairs only for clusters that big, which the exact
# connected-components pass downstream re-links anyway. Same role as
# NG_DF_CAP below.
MH_BUCKET_CAP = 200
_MH_A_SQL = "[" + ", ".join(map(str, MH_A)) + "]"
_MH_B_SQL = "[" + ", ".join(map(str, MH_B)) + "]"


def minhash_bands(raw: DataFrame) -> DataFrame:
    """(doc_id, band, sig) banded minhash signatures for a documents
    frame — the shared LSH front end of `dedup_minhash_lsh` (C5) and
    the incremental probe (C45).

    All MH_PERMS minhashes are computed MAP-SIDE per row: one md5 per
    shingle (materialised once as h31s, a column projection), then 8
    affine maps + array_min each — no (doc, perm) explode, no shuffle.
    The exploded version this replaced pushed |shingles| × 8 rows
    through a groupBy.
    """
    # Assembled as SQL text (one F.expr per projection) — the Column
    # form of this builder cost ~0.5 s of py4j round-trips per call
    # site (see functions/text.py "Spark SQL twins"); trees identical.
    sh = spark_sql_shingles(spark_sql_tokens("text"), MH_SHINGLE_K)
    hashed = raw.select(
        "doc_id",
        F.expr(
            f"transform({sh}, s -> {spark_sql_hash64('s')} & 2147483647)"
        ).alias("h31s"),
    )
    mins = [
        f"array_min(transform(h31s, h -> ({MH_A[p]} * h + {MH_B[p]}) % {MH_PRIME}))"
        for p in range(MH_PERMS)
    ]
    n_bands = MH_PERMS // MH_ROWS_PER_BAND
    sig_df = hashed.select("doc_id", F.expr(f"array({', '.join(mins)})").alias("mhs"))
    band_sigs = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(
            f"CAST(element_at(mhs, {b * MH_ROWS_PER_BAND + r + 1}) AS STRING)"
            for r in range(MH_ROWS_PER_BAND)
        )
        + "))"
        for b in range(n_bands)
    )
    return sig_df.select(
        "doc_id", F.posexplode(F.expr(f"array({band_sigs})")).alias("band", "sig")
    )


_C5_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
ex AS (
  SELECT doc_id, {sql_hash64('s')} & 2147483647 AS h31
  FROM (SELECT doc_id, unnest(sh) AS s FROM docs)
),
mh AS (
  SELECT doc_id, p,
         MIN(({_MH_A_SQL}[p + 1] * h31 + {_MH_B_SQL}[p + 1]) % {MH_PRIME}) AS mh
  FROM ex CROSS JOIN (SELECT unnest(generate_series(0, {MH_PERMS - 1})) AS p)
  GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {MH_ROWS_PER_BAND} AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY p)) AS sig
  FROM mh GROUP BY doc_id, p // {MH_ROWS_PER_BAND}
),
bsize AS (
  SELECT band, sig FROM bands
  GROUP BY band, sig HAVING COUNT(*) BETWEEN 2 AND {MH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.sig = a.sig
),
jac AS (
  SELECT i, j,
         len(list_intersect(da.sh, db.sh)) * 1.0
           / len(list_distinct(da.sh || db.sh)) AS jac
  FROM cand
  JOIN docs da ON i = da.doc_id
  JOIN docs db ON j = db.doc_id
)
SELECT i AS id_a, j AS id_b, ROUND(jac + 1e-9, 4) AS jaccard
FROM jac WHERE jac >= {JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("dedup_minhash_lsh", oracle=_C5_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-duplicate detection.

    shingle → k minhashes → band signatures → bucket self-join →
    exact-Jaccard verify. The only wide shuffles are the per-(doc,perm)
    min aggregation and the band-bucket join; candidate verification
    touches only bucket-collision pairs — the 100 TB dedup shape.
    """
    raw = load_table(spark, sf_dir, "documents")
    bands = minhash_bands(raw)
    # Bucket members per (band, sig); pairs expand map-side from the
    # sorted member list (same one-shuffle shape as ngram_jaccard).
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= MH_BUCKET_CAP))
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    return _jaccard_verify(raw, cand, MH_SHINGLE_K)


def _jaccard_verify(
    raw: DataFrame, cand: DataFrame, k: int, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs: semi-join the id
    set before the shingle computation, then broadcast the tiny pair
    frame so the doc side never shuffles.

    ``cand`` is persisted first: it feeds three subtrees (two id
    semi-joins + the pair broadcast), and without materialisation
    Catalyst re-executes the whole candidate-generation pipeline —
    i.e. three full corpus shingle passes — once per subtree. The
    candidate set is bucket-capped and tiny relative to the corpus, so
    persisting it is the standard production-LSH shape: materialise
    candidates once, verify once.
    """
    cand = cand.persist()
    cand_ids = cand.select(F.explode(F.array("i", "j")).alias("doc_id")).distinct()
    docs = (
        raw.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select(
            "doc_id",
            F.expr(spark_sql_shingles(spark_sql_tokens("text"), k)).alias("sh"),
        )
        .persist()  # shingled candidate docs feed both join sides
    )
    jac = (
        docs.select(F.col("doc_id").alias("i"), F.col("sh").alias("sh_a"))
        .join(F.broadcast(cand), "i")
        .join(
            docs.select(F.col("doc_id").alias("j"), F.col("sh").alias("sh_b")).hint(
                "broadcast"
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                * F.lit(1.0)
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jac"),
        )
    )
    return (
        jac.where(F.col("jac") >= threshold)
        .select(
            F.col("i").alias("id_a"),
            F.col("j").alias("id_b"),
            round_eps(F.col("jac"), 4).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------- C6

# 60 bits = the full md5-nibble budget of hash64 (hexdigest()[:15]);
# stays POSITIVE in int64, so shiftright/shift-left band arithmetic is
# sign-safe in both engines. Band width is the dedup scale knob: with
# hamming<=3 the pigeonhole band count is fixed at 4, so per-band
# bucket occupancy is n / 2^(bits/4) — the 8-bit bands of the original
# 32-bit signature saturated at the 64x replica stress (n/256 docs per
# bucket, candidate pairs ~ n^2/256, measured b~1.8); 15-bit bands
# (32768 buckets/band) hold occupancy ~10 at 320k docs. A wider hash
# (two halves like media_dedup_phash) is the next rung if a corpus
# outgrows this; never narrow the bands.
SIM_BITS = 60
SIM_BAND_BITS = 15  # 4 bands; pigeonhole covers hamming ≤ 3 exactly
SIM_HAM_MAX = 3


_C6_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS tk FROM documents
),
tf AS (
  SELECT doc_id, tk, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tk
),
hashed AS (
  SELECT doc_id, cnt, {sql_hash64('tk')} AS h FROM tf
),
contrib AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h >> bit) & 1 = 1 THEN cnt ELSE -cnt END) AS bal
  FROM hashed
  CROSS JOIN (SELECT unnest(generate_series(0, {SIM_BITS - 1})) AS bit)
  GROUP BY doc_id, bit
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN bal > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
  FROM contrib GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {SIM_BAND_BITS})) & {(1 << SIM_BAND_BITS) - 1}
           AS band_val
  FROM sig CROSS JOIN (
    SELECT unnest(generate_series(0, {SIM_BITS // SIM_BAND_BITS - 1})) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT i AS id_a, j AS id_b,
       bit_count(xor(sig_a, sig_b)) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= {SIM_HAM_MAX}
ORDER BY id_a, id_b
"""


@register("dedup_simhash", oracle=_C6_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency-weighted SimHash near-dup detection
    (``SIM_BITS`` = 60-bit signatures).

    TF weights matter: this corpus draws from a ~30-word vocabulary, so
    token *sets* are corpus-wide identical and an unweighted simhash
    degenerates to "everything matches everything". Weighted by counts,
    signatures track the docs' frequency profiles and only true
    near-copies land within hamming ≤ 3. Candidates share one
    ``SIM_BAND_BITS`` = 15-bit band (pigeonhole over 4 bands guarantees
    recall at hamming ≤ 3); verify by exact Hamming distance. The wide
    bands are the 64x-stress fix: 8-bit bands saturate at replica scale
    (2^8 buckets for 10^6 docs → quadratic candidate blowup), 15-bit
    bands keep bucket occupancy bounded.
    """
    import hashlib
    from collections import Counter

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    bit_idx = np.arange(SIM_BITS, dtype=np.int64)

    def _simhash(toks_col):
        # md5-based hash64 matches the oracle's; the ±1 bit vector per
        # distinct token is memoised, so cost is O(unique tokens), not
        # O(tokens × bits). The (doc, bit) explode this replaced pushed
        # tokens × 32 rows through a shuffle.
        memo: dict = {}
        out = np.empty(len(toks_col), dtype=np.int64)
        for i, toks in enumerate(toks_col):
            bal = np.zeros(SIM_BITS, dtype=np.int64)
            for tk, c in Counter(toks).items():
                vec = memo.get(tk)
                if vec is None:
                    h = int(hashlib.md5(tk.encode()).hexdigest()[:15], 16)
                    vec = (((h >> bit_idx) & 1) * 2 - 1).astype(np.int64)
                    memo[tk] = vec
                bal += vec * c
            out[i] = int(((bal > 0).astype(np.int64) << bit_idx).sum())
        return pd.Series(out)

    _simhash.__annotations__ = {"toks_col": pd.Series, "return": pd.Series}
    simhash_udf = pandas_udf(_simhash, "long")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    sig = docs.select("doc_id", simhash_udf(F.col("toks")).alias("simhash"))
    n_bands = SIM_BITS // SIM_BAND_BITS
    mask = (1 << SIM_BAND_BITS) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftright(simhash, {b * SIM_BAND_BITS}) & {mask}"
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.band_val")
    # Persisted: the band self-join reads this subtree twice, and the
    # signature UDF (the corpus pass) must run once, not once per side.
    bands = bands.persist()
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)"))
        .where(F.col("hamming") <= SIM_HAM_MAX)
        .select(F.col("i").alias("id_a"), F.col("j").alias("id_b"), "hamming")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------- C7

NG_DF_CAP = 100  # drop shingles appearing in more docs (stopword-shingle guard)
NG_BLOCK_K = 5  # longer shingles for *blocking* only: far rarer → tiny postings


_C7_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), MH_SHINGLE_K)} AS sh
  FROM documents
),
blocks AS (
  SELECT doc_id, {sql_shingles(sql_tokens('text'), NG_BLOCK_K)} AS bh
  FROM documents
),
ex AS (SELECT doc_id, unnest(bh) AS s FROM blocks),
df AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {NG_DF_CAP}),
indexed AS (SELECT ex.doc_id, ex.s FROM ex JOIN df USING (s)),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM indexed a JOIN indexed b ON a.s = b.s AND a.doc_id < b.doc_id
),
jac AS (
  SELECT i, j,
         len(list_intersect(da.sh, db.sh)) * 1.0
           / len(list_distinct(da.sh || db.sh)) AS jac
  FROM cand
  JOIN docs da ON i = da.doc_id
  JOIN docs db ON j = db.doc_id
)
SELECT i AS id_a, j AS id_b, ROUND(jac + 1e-9, 4) AS jaccard
FROM jac WHERE jac >= {JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


@register("ngram_jaccard", oracle=_C7_ORACLE)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index n-gram Jaccard near-dup pairs.

    Candidates = pairs sharing ≥1 indexed *blocking* shingle (longer,
    k=5: in a low-entropy corpus 3-gram postings are huge, 5-gram
    postings are tiny), with a document-frequency cap as the skew guard.
    Verification scores the full 3-gram sets. A ≥0.5-Jaccard 3-gram pair
    shares long runs of text, hence 5-gram shingles too — blocking on
    the longer shingle costs no recall at the target threshold.
    """
    raw = load_table(spark, sf_dir, "documents")
    ex = raw.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), NG_BLOCK_K)).alias("s")
    )
    # Posting list per blocking shingle, capped (skew guard), pairs
    # expanded MAP-SIDE from each sorted list — one shuffle total, vs the
    # exploded-postings self-join this replaced (two shuffles of the full
    # posting stream plus a join).
    posts = (
        ex.groupBy("s")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= NG_DF_CAP))
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    cand = (
        posts.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .distinct()
    )
    return _jaccard_verify(raw, cand, MH_SHINGLE_K)


# ---------------------------------------------------------------- C16

_C16_ORACLE = f"""
WITH RECURSIVE
edges0 AS (SELECT id_a, id_b FROM ({_C5_ORACLE})),
edges AS (
  SELECT id_a AS x, id_b AS y FROM edges0
  UNION ALL
  SELECT id_b AS x, id_a AS y FROM edges0
),
reach AS (
  SELECT doc_id AS v, doc_id AS w FROM documents
  UNION
  SELECT r.v, e.y FROM reach r JOIN edges e ON r.w = e.x
)
SELECT v AS doc_id, MIN(w) AS component_id,
       v <> MIN(w) AS is_duplicate
FROM reach GROUP BY v ORDER BY doc_id
"""


@register("text_dedup_pipeline", oracle=_C16_ORACLE)
def text_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus text-dedup pipeline in one plan:
    minhash-LSH candidates → exact-Jaccard verify → connected
    components → min-id exemplar + keep/drop flag.

    This is the reference's complete dedup flow (deduplication.py edges
    → JobAdDuplicateLink → dqa get_duplicate_subgraphs → exemplar) over
    *text* instead of vectors — the composition a 100 TB corpus dedup
    actually runs. The oracle reuses C5's SQL verbatim for the edge set
    (LSH banding is deterministic), then takes transitive closure
    recursively, so component equality proves the distributed
    min-label-propagation loop converged to the true closure.
    """
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("id_a").alias("first_id"), F.col("id_b").alias("second_id")
    )
    comps = connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    return comps.select(
        "doc_id",
        "component_id",
        (F.col("doc_id") != F.col("component_id")).alias("is_duplicate"),
    ).orderBy("doc_id")
