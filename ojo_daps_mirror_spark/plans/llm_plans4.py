"""LLM training-data plans, fourth sweep (SURVEY.md §2 C36–C39, B38).

Line-level boilerplate filtering (the jusText/CCNet segment-quality
shape), an inverted-index build, exact per-stratum fixed-size sampling,
Bloom-filter decontamination (the fixed-memory alternative to C18's
broadcast shingle set), and a fixed-width histogram aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import (
    STOPWORDS,
    hash64,
    shingles,
    sql_hash64,
    sql_shingles,
    sql_tokens,
    tokens,
)
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- C36

LINE_TOKENS = 10  # tokens per synthetic "line" (docs are flat word streams)
LINE_MIN_TOKENS = 3  # short tail lines are dropped as boilerplate

_stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)

_C36_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
lines AS (
  SELECT doc_id, i AS idx,
         CAST(CEIL(len(t) / {LINE_TOKENS}.0) AS BIGINT) AS n_lines,
         t[((i-1)*{LINE_TOKENS}+1):(i*{LINE_TOKENS})] AS lt
  FROM toks,
       unnest(generate_series(
         1, CAST(CEIL(len(t) / {LINE_TOKENS}.0) AS BIGINT))) AS u(i)
),
scored AS (
  SELECT doc_id, idx, n_lines, lt,
         len(list_filter(lt, x -> x IN ({_stop_list}))) AS stop_hits
  FROM lines
)
SELECT doc_id,
       MIN(n_lines) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(array_to_string(lt, ' '), ' ' ORDER BY idx) AS text_clean
FROM scored
WHERE stop_hits >= 1 AND len(lt) >= {LINE_MIN_TOKENS}
GROUP BY doc_id
ORDER BY doc_id
"""


@register("line_quality_filter", oracle=_C36_ORACLE)
def line_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level boilerplate removal — the jusText / CCNet
    line-filter stage: split each doc into fixed {LINE_TOKENS}-token
    "lines" (the testdata docs are flat word streams with no newlines),
    keep only content lines (≥1 stopword hit — the function-word
    density cue — and ≥{LINE_MIN_TOKENS} tokens), and reassemble; a doc
    with no surviving line drops out entirely.

    Scale shape: segmentation is a map-side posexplode; scoring is a
    per-row array expression (no shuffle); the only wide operation is
    the per-doc reassembly groupBy with a sorted in-group collect —
    identical placement to paragraph_dedup (C31), so the same plan
    holds at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_lines = F.ceil(F.size(toks) / float(LINE_TOKENS)).cast("bigint")
    line_arr = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.slice(toks, (i - 1) * LINE_TOKENS + 1, LINE_TOKENS),
    )
    lines = docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.posexplode(line_arr).alias("idx0", "lt"),
    ).select(
        "doc_id",
        "n_lines",
        (F.col("idx0") + 1).alias("idx"),
        "lt",
        F.size(F.filter(F.col("lt"), lambda t: t.isin(*STOPWORDS))).alias(
            "stop_hits"
        ),
    )
    kept = lines.where(
        (F.col("stop_hits") >= 1) & (F.size("lt") >= LINE_MIN_TOKENS)
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.min("n_lines").alias("n_lines"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "lt"))),
                        lambda s: s["lt"],
                    )
                ),
                " ",
            ).alias("text_clean"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C37

POSTINGS_CAP = 20  # postings kept per term in the materialised index

_C37_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT doc_id, unnest({sql_tokens("text")}) AS term FROM documents)
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS doc_freq,
       array_to_string(list_sort(list(doc_id))[1:{POSTINGS_CAP}], ',')
         AS postings
FROM pairs
GROUP BY term
ORDER BY term
"""


@register("inverted_index", oracle=_C37_ORACLE)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + the first
    {POSTINGS_CAP} posting ids (sorted) — the retrieval-side structure
    behind decontamination lookups and BM25-style corpus search.

    Scale shape: per-doc distinct tokens are map-side
    (array_distinct before the explode, so a term counts once per
    doc); ONE wide shuffle at term grain with map-side combine; the
    posting list is capped so no reducer materialises an unbounded
    collect for stopword-like terms — the cap is the classic
    postings-truncation guard for heavy terms.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, POSTINGS_CAP),
                ",",
            ).alias("postings"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------- C38

SAMPLE_PER_GROUP = 40

_C38_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, rn FROM ranked
WHERE rn <= {SAMPLE_PER_GROUP}
ORDER BY lang, rn
"""


@register("group_sample_fixed", oracle=_C38_ORACLE)
def group_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-size per-stratum sample: {SAMPLE_PER_GROUP} docs per
    language, chosen by md5-of-id order — a deterministic,
    engine-reproducible "random" draw (no rand(), stable under
    re-partitioning), the eval-slice builder next to C19/C33's
    rate-based samplers.

    Scale shape: one window at lang grain. Languages are few and huge
    at 100 TB, so the partition sort is the cost — the production
    swap is a per-partition top-k (heap) aggregate per lang with the
    same hash order, which is rank-equivalent for rn ≤ k; the window
    form is the oracle-parity choice at test SFs.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SAMPLE_PER_GROUP)
        .orderBy("lang", "rn")
    )


# ---------------------------------------------------------------- C39

BLOOM_BITS = 65536  # m: 2^16 bits = 2048 32-bit-packed words (~8 KiB)
BLOOM_WORDS = BLOOM_BITS // 32  # 32 bits packed per bigint word (DuckDB << overflows at bit 63)
BLOOM_K = 3  # hash functions
BLOOM_SHINGLE_K = 3
BLOOM_BENCH_MOD = 50  # doc_id % 50 == 0 plays the held-out benchmark


# All BLOOM_K positions derive from ONE md5 per shingle (the classic
# split-hash / double-hashing Bloom construction): the 60-bit hash64 is
# cut into disjoint 16-bit slices. One hash evaluation instead of K.


def _sql_bloom_pos(h_expr: str, i: int) -> str:
    return f"((({h_expr}) >> {16 * i}) % {BLOOM_BITS})"


def _bloom_pos(h_col, i: int):
    return F.shiftright(h_col, 16 * i) % BLOOM_BITS


_pos_union = " UNION ALL ".join(
    f"SELECT {_sql_bloom_pos('h', i)} AS pos FROM bench"
    for i in range(BLOOM_K)
)
_probe_union = " UNION ALL ".join(
    f"SELECT doc_id, s, {_sql_bloom_pos('h', i)} AS pos FROM sh"
    f" WHERE doc_id % {BLOOM_BENCH_MOD} <> 0"
    for i in range(BLOOM_K)
)

_C39_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, s, {sql_hash64("s")} AS h
  FROM (
    SELECT doc_id,
           unnest({sql_shingles(sql_tokens("text"), BLOOM_SHINGLE_K)}) AS s
    FROM documents
  )
),
bench AS (
  SELECT DISTINCT s, h FROM sh WHERE doc_id % {BLOOM_BENCH_MOD} = 0
),
bloom AS (
  SELECT pos // 32 AS word,
         bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM ({_pos_union})
  GROUP BY pos // 32
),
probe AS ({_probe_union}),
hits AS (
  SELECT p.doc_id, p.s,
         SUM(CASE WHEN ((b.bits >> (p.pos % 32)) & 1) = 1
                  THEN 1 ELSE 0 END) AS set_bits
  FROM probe p JOIN bloom b ON p.pos // 32 = b.word
  GROUP BY p.doc_id, p.s
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bloom_hits
FROM hits
WHERE set_bits = {BLOOM_K}
GROUP BY doc_id
ORDER BY doc_id
"""


@register("bloom_decontaminate", oracle=_C39_ORACLE)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination — the fixed-memory
    alternative to C18's broadcast shingle SET. The benchmark slice's
    shingles are folded into a {BLOOM_BITS}-bit Bloom filter
    ({BLOOM_K} positions cut from one md5-derived 60-bit hash — the
    split-hash construction, one hash evaluation per shingle); every
    training-doc
    shingle probes the filter, and a doc is flagged with its count of
    bloom-positive shingles (a superset of C18's true hits — the
    filter's false positives are part of the defined output, and both
    engines build the identical filter, so the oracle is exact).

    Scale shape: the filter is ≤{BLOOM_WORDS} (word, bits) rows no
    matter how large the benchmark grows — built with one bit_or
    aggregate and BROADCAST-joined {BLOOM_K}× at shingle grain (one
    hash-lookup join per hash function, no pair-grain re-aggregation),
    where C18's set broadcast grows linearly with the benchmark. The
    bit tests are map-side codegen between the joins; the only wide
    operation is the final doc-grain count, map-side combined. At
    100 TB the filter is sized m ≈ 1.44·n·log2(1/fp) once and stays a
    constant few MiB of broadcast, the layout a production
    decontamination pass wants.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), BLOOM_SHINGLE_K)).alias("s"),
    ).select("doc_id", "s", hash64(F.col("s")).alias("h"))
    bench = (
        sh.where(F.col("doc_id") % BLOOM_BENCH_MOD == 0).select("s", "h").distinct()
    )
    from ..operators.lineage import cut_lineage

    pos_arr = F.array(*[_bloom_pos(F.col("h"), i) for i in range(BLOOM_K)])
    # ≤BLOOM_WORDS rows, materialized ONCE: the filter feeds BLOOM_K
    # separately-named broadcast sides, and without the lineage cut
    # each broadcast re-ran the whole bench-slice scan + hash +
    # bit_or build (K copies of the build pipeline in the plan).
    bloom = (
        bench.select(F.explode(pos_arr).alias("pos"))
        .groupBy((F.col("pos") / 32).cast("bigint").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
            ).alias("bits")
        )
        .transform(cut_lineage)
    )
    probe = sh.where(F.col("doc_id") % BLOOM_BENCH_MOD != 0).select(
        "doc_id",
        *[_bloom_pos(F.col("h"), i).alias(f"pos{i}") for i in range(BLOOM_K)],
    )
    for i in range(BLOOM_K):
        b_i = F.broadcast(
            bloom.select(
                F.col("word").alias(f"word{i}"), F.col("bits").alias(f"bits{i}")
            )
        )
        probe = probe.join(
            b_i, (F.col(f"pos{i}") / 32).cast("bigint") == F.col(f"word{i}")
        ).where(
            F.expr(
                f"(shiftright(bits{i}, CAST(pos{i} % 32 AS INT))"
                f" & CAST(1 AS BIGINT)) = 1"
            )
        )
    return (
        probe.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- B38

HIST_BIN_WIDTH = 25000

_B38_ORACLE = f"""
SELECT CAST(FLOOR(o_totalprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_round("MIN(o_totalprice)", 2)} AS min_price,
       {sql_round("MAX(o_totalprice)", 2)} AS max_price,
       {sql_round("AVG(o_totalprice)", 2)} AS mean_price
FROM orders
GROUP BY bin
ORDER BY bin
"""


@register("order_price_histogram", oracle=_B38_ORACLE)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value ({HIST_BIN_WIDTH}-wide
    bins) with per-bin min/max/mean — the distribution profile behind
    the reference's DQA plots (dqa/s3_length_of_descriptions.py renders
    exactly this shape over description lengths).

    Scale shape: binning is a scalar projection, so the aggregate
    combines map-side to |bins| rows — the whole 100 TB scan reduces in
    one pass with no window, no sort, and a reducer state of a few
    dozen rows. This is the histogram plan that replaces driver-side
    numpy binning.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / HIST_BIN_WIDTH)
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_eps(F.min("o_totalprice"), 2).alias("min_price"),
            round_eps(F.max("o_totalprice"), 2).alias("max_price"),
            round_eps(F.avg("o_totalprice"), 2).alias("mean_price"),
        )
        .orderBy("bin")
    )
