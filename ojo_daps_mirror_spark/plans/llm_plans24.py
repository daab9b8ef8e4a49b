"""Twenty-fourth sweep (SURVEY.md §2 B58, C83).

Chi-square independence test on the contingency machinery and a
perceptual-hash-style media dedup through the binary-column kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B58

_B58_ORACLE = f"""
WITH joint AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS t FROM joint),
cells AS (
  SELECT seg, pri, n,
         SUM(n) OVER (PARTITION BY seg) * 1.0
           * SUM(n) OVER (PARTITION BY pri) / (SELECT t FROM tot) AS expected
  FROM joint
),
dims AS (
  SELECT COUNT(DISTINCT seg) AS r, COUNT(DISTINCT pri) AS c FROM cells
)
SELECT seg, pri, CAST(n AS BIGINT) AS n,
       {sql_round('expected', 4)} AS expected,
       {sql_round('(n - expected) * (n - expected) / expected', 6)} AS contrib,
       {sql_round(
           '(SELECT SUM((n - expected) * (n - expected) / expected)'
           ' FROM cells)', 6)} AS chi2_total,
       (SELECT CAST((r - 1) * (c - 1) AS BIGINT) FROM dims) AS dof
FROM cells ORDER BY seg, pri
"""


@register("chi_square_independence", oracle=_B58_ORACLE)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (segment × priority) —
    B52's MI sibling and the categorical-drift detector: per-cell
    expected counts, contributions, the chi² statistic and its degrees
    of freedom, all from the SAME one-aggregate contingency table
    (marginals, total, dof and the chi² sum are windows over the
    ≤25-row frame; the broadcast dim join is the only fact-side work).
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joint = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = F.sum("n").over(Window.partitionBy())
    expected = (
        F.sum("n").over(Window.partitionBy("seg"))
        * F.sum("n").over(Window.partitionBy("pri"))
        / t
    )
    cells = joint.select("seg", "pri", "n", expected.alias("expected"))
    contrib = (F.col("n") - F.col("expected")) ** 2 / F.col("expected")
    w_all = Window.partitionBy()
    return (
        cells.select(
            "seg",
            "pri",
            F.col("n").cast("bigint").alias("n"),
            round_eps(F.col("expected"), 4).alias("expected"),
            round_eps(contrib, 6).alias("contrib"),
            round_eps(F.sum(contrib).over(w_all), 6).alias("chi2_total"),
            (
                (F.size(F.collect_set("seg").over(w_all)) - 1)
                * (F.size(F.collect_set("pri").over(w_all)) - 1)
            )
            .cast("bigint")
            .alias("dof"),
        )
        .orderBy("seg", "pri")
    )


# ---------------------------------------------------------------- C83

PHASH_BANDS = 4  # pigeonhole: ham<=3 over 4 bands -> one band exact
PHASH_HAM_MAX = 3

_C83_ORACLE = f"""
WITH fp AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 8))::BIGINT AS ph,
         ('0x' || substr(md5(text), 9, 8))::BIGINT AS pl
  FROM documents
),
bands AS (
  SELECT doc_id, b,
         CASE b WHEN 0 THEN ph // 65536 WHEN 1 THEN ph % 65536
                WHEN 2 THEN pl // 65536 ELSE pl % 65536 END AS band_val
  FROM fp, LATERAL unnest(generate_series(0, {PHASH_BANDS - 1})) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT cand.id_a, cand.id_b,
       CAST(bit_count(xor(fa.ph, fb.ph)) + bit_count(xor(fa.pl, fb.pl))
            AS BIGINT) AS hamming
FROM cand
JOIN fp fa ON fa.doc_id = cand.id_a
JOIN fp fb ON fb.doc_id = cand.id_b
WHERE bit_count(xor(fa.ph, fb.ph)) + bit_count(xor(fa.pl, fb.pl))
      <= {PHASH_HAM_MAX}
ORDER BY id_a, id_b
"""


@register("media_dedup_phash", oracle=_C83_ORACLE)
def media_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup through the binary column: every blob fingerprints
    to 64 bits inside the Arrow kernel (operators/multimodal.py:
    fingerprint_batch — the pHash slot as two positive 32-bit halves;
    the stand-in hashes raw bytes, a real deployment hashes decoded
    pixels and NOTHING downstream changes), then C6's banding shape
    finds near-identical fingerprints: 4×16-bit bands → bucket pairs →
    hamming ≤ {PHASH_HAM_MAX} verify via bit_count(xor) on each half.

    The band width is the scale story: hamming ≤ 3 pigeonholes into 4
    bands no matter what, so per-band occupancy is n / 2^width. The
    original 32-bit / 8-bit-band version measured b≈1.3 at the 16×
    replica stress (bucket pairs ∝ n²/256); 16-bit bands keep
    occupancy ~1 into the 10^7-blob range, and a production pHash
    widens the fingerprint further, never the buckets.

    With the md5 stand-in only identical payloads collide (avalanche),
    so the output is the exact-duplicate media pairs — the banding
    pipeline is what a true perceptual hash would light up. The oracle
    mirrors the fingerprint SQL-side (payload = utf-8 text bytes, so
    md5(payload) = md5(text)).
    """
    from ..operators.multimodal import fingerprint_media

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint_media(docs).select("doc_id", "phash", "phash_lo").persist()
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1)),
        lambda b: F.struct(
            b.alias("b"),
            F.when(b == 0, (F.col("phash") / 65536).cast("bigint"))
            .when(b == 1, F.col("phash") % 65536)
            .when(b == 2, (F.col("phash_lo") / 65536).cast("bigint"))
            .otherwise(F.col("phash_lo") % 65536)
            .alias("band_val"),
        ),
    )
    bands = fp.select("doc_id", F.explode(band_arr).alias("x")).select(
        "doc_id", "x.b", "x.band_val"
    )
    buckets = (
        bands.groupBy("b", "band_val")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    ds = F.col("ds")
    pair_arr = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    fa = fp.select(
        F.col("doc_id").alias("id_a"),
        F.col("phash").alias("pa"),
        F.col("phash_lo").alias("pla"),
    )
    fb = fp.select(
        F.col("doc_id").alias("id_b"),
        F.col("phash").alias("pb"),
        F.col("phash_lo").alias("plb"),
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))) + F.bit_count(
        F.col("pla").bitwiseXOR(F.col("plb"))
    )
    return (
        cand.join(F.broadcast(fa), "id_a")
        .join(F.broadcast(fb), "id_b")
        .where(ham <= PHASH_HAM_MAX)
        .select("id_a", "id_b", ham.cast("bigint").alias("hamming"))
        .orderBy("id_a", "id_b")
    )
