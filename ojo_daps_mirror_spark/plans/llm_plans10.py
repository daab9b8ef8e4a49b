"""Tenth sweep (SURVEY.md §2 C58–C60).

PMI collocation mining (the classic corpus-linguistics association
score) and per-vector embedding outlier scoring (distance-to-centroid
z-scores) and the dataset-version diff primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_tokens, tokens
from ..operators.attach import scalars
from ..operators.lineage import cut_lineage
from ..sources import load_table
from .. import scale_mode as sm
from . import register

# ---------------------------------------------------------------- C58

PMI_DOC_VOCAB_CAP = 100  # distinct tokens considered per doc (sorted)
PMI_MIN_PAIR_DF = 5
PMI_TOP = 30

_C58_ORACLE = f"""
WITH capped AS (
  SELECT doc_id,
         list_sort(list_distinct({sql_tokens("text")}))[1:{PMI_DOC_VOCAB_CAP}]
           AS ts
  FROM documents
),
n_docs AS (SELECT COUNT(*) AS n FROM capped),
ex AS (SELECT doc_id, unnest(ts) AS t FROM capped),
tok_df AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY t
),
pair_df AS (
  SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS df_ab
  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT t1, t2, df_ab, d1.df AS df1, d2.df AS df2,
       {sql_round(
           "ln((SELECT n FROM n_docs) * 1.0 * df_ab / (d1.df * d2.df))", 6
       )} AS pmi
FROM pair_df
JOIN tok_df d1 ON d1.t = t1
JOIN tok_df d2 ON d2.t = t2
WHERE df_ab >= {PMI_MIN_PAIR_DF}
ORDER BY pmi DESC, t1, t2
LIMIT {PMI_TOP}
"""


@register("pmi_collocations", oracle=_C58_ORACLE)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: token pairs that
    co-occur in documents far more than independence predicts —
    PMI = ln(N·df_ab / (df_a·df_b)) — the association score behind
    phrase detection and the reference's skill-surface-form seeding
    (labs/skills lexicon construction works from exactly this signal).

    Scale shape: each doc contributes pairs from its SORTED distinct
    token set, capped at {PMI_DOC_VOCAB_CAP} tokens (bounds the
    per-doc pair fan-out at C({PMI_DOC_VOCAB_CAP},2) regardless of doc
    length) and expanded MAP-SIDE — no token-grain self-join. Pair
    counts combine map-side to pair-vocabulary grain; token df is a
    tiny broadcast; top-k is a TakeOrderedAndProject. The oracle uses
    the quadratic self-join form.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    capped = docs.select(
        "doc_id",
        F.slice(
            F.array_sort(F.array_distinct(tokens(F.col("text")))),
            1,
            PMI_DOC_VOCAB_CAP,
        ).alias("ts"),
    )
    # |docs| as a broadcast scalar, not a driver-side .count(): capped is
    # one row per document (no filter), so the doc count is the plain
    # documents row count — a column-pruned scan, no tokenize pass, and
    # no eager driver action in the query path (guide §5).
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs__"))
    ts = F.col("ts")
    pair_arr = F.flatten(
        F.transform(
            ts,
            lambda x, i: F.transform(
                F.slice(ts, i + F.lit(2), F.size(ts)),
                lambda y: F.struct(x.alias("t1"), y.alias("t2")),
            ),
        )
    )
    pair_df = (
        capped.select(F.explode(pair_arr).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("df_ab"))
        .where(F.col("df_ab") >= PMI_MIN_PAIR_DF)
    )
    tok_df = (
        capped.select(F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    d1 = tok_df.select(F.col("t").alias("t1"), F.col("df").alias("df1"))
    d2 = tok_df.select(F.col("t").alias("t2"), F.col("df").alias("df2"))
    pmi = F.log(
        F.col("__n_docs__") * F.col("df_ab") / (F.col("df1") * F.col("df2"))
    )
    return (
        pair_df.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .transform(scalars(n_docs))
        .select("t1", "t2", "df_ab", "df1", "df2", round_eps(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2"))
        .limit(PMI_TOP)
    )


# ---------------------------------------------------------------- C59

OUTLIER_Z = 2.0

_C59_ORACLE = f"""
WITH dims AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
mu AS (
  SELECT label, dim, AVG(v) AS mu FROM dims GROUP BY label, dim
),
dist AS (
  SELECT d.vec_id, d.label,
         SUM((d.v - mu.mu) * (d.v - mu.mu)) AS sqdist
  FROM dims d JOIN mu ON d.label = mu.label AND d.dim = mu.dim
  GROUP BY d.vec_id, d.label
),
scored AS (
  SELECT vec_id, label, sqdist,
         AVG(sqdist) OVER (PARTITION BY label) AS m,
         STDDEV_SAMP(sqdist) OVER (PARTITION BY label) AS s
  FROM dist
)
SELECT vec_id, label,
       {sql_round("sqdist", 4)} AS sqdist,
       {sql_round("(sqdist - m) / s", 4)} AS z_score,
       CASE WHEN (sqdist - m) / s > {OUTLIER_Z} THEN 1 ELSE 0 END AS is_outlier
FROM scored
ORDER BY vec_id
"""


@register("embedding_outliers", oracle=_C59_ORACLE)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding outlier scoring: squared distance to the
    label centroid, z-scored within the label, flagged above
    {OUTLIER_Z}σ — the embedding-space data-quality gate
    (mislabeled/corrupted items sit far from their cluster), the
    per-row companion to C48's cluster aggregates.

    Scale shape: centroids are a (label, dim)-grain map-side-combined
    aggregate (|labels|·dim rows — tiny) BROADCAST back onto the
    exploded vector stream, so per-vector distances are map-side after
    one explode; the z-normalisation windows run at label grain over
    per-vector scalars. Nothing pairwise anywhere.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"),
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "v")
    mu = dims.groupBy("label", "dim").agg(F.avg("v").alias("mu"))
    dist = (
        dims.join(F.broadcast(mu), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("v") - F.col("mu")) * (F.col("v") - F.col("mu"))).alias(
                "sqdist"
            )
        )
    )
    w = Window.partitionBy("label")
    scored = dist.select(
        "vec_id",
        "label",
        "sqdist",
        F.avg("sqdist").over(w).alias("m"),
        F.stddev_samp("sqdist").over(w).alias("s"),
    )
    z = (F.col("sqdist") - F.col("m")) / F.col("s")
    return scored.select(
        "vec_id",
        "label",
        round_eps(F.col("sqdist"), 4).alias("sqdist"),
        round_eps(z, 4).alias("z_score"),
        F.when(z > OUTLIER_Z, 1).otherwise(0).alias("is_outlier"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------- C60

DIFF_OLD_MOD = 10  # doc_id % 10 == 7 is absent from the "old" snapshot
DIFF_OLD_REM = 7

_C60_ORACLE = f"""
WITH new AS (
  SELECT doc_id, md5(text) AS h, lang FROM documents
),
old AS (
  -- the prior snapshot: the probe batch absent, one field drifted
  SELECT doc_id,
         md5(CASE WHEN doc_id % 97 = 0 THEN text || ' [stale]'
                  ELSE text END) AS h
  FROM documents WHERE doc_id % {DIFF_OLD_MOD} <> {DIFF_OLD_REM}
)
SELECT COALESCE(new.doc_id, old.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN new.h <> old.h THEN 'changed'
            ELSE 'unchanged' END AS change
FROM new FULL OUTER JOIN old USING (doc_id)
WHERE NOT (new.doc_id IS NOT NULL AND old.doc_id IS NOT NULL
           AND new.h = old.h)
ORDER BY doc_id
"""


@register("dataset_diff", oracle=_C60_ORACLE)
def dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: added / removed / changed rows between two
    corpus snapshots, compared by CONTENT HASH so a full-row compare
    never ships row bodies through the join — the data-versioning
    primitive behind reproducible training-set releases (what changed
    between corpus v1 and v2). The "old" snapshot is derived
    deterministically (the doc_id%10==7 batch absent, every 97th doc's
    text drifted) so both engines diff identical inputs.

    Scale shape: each side reduces to (key, 64-bit-hash) map-side; ONE
    full-outer shuffle join on the key; unchanged rows — the vast
    majority between adjacent versions — are filtered immediately
    after the join so only the delta survives to output.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.select("doc_id", F.md5("text").alias("h"))
    old = (
        docs.where(F.col("doc_id") % DIFF_OLD_MOD != DIFF_OLD_REM)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit(" [stale]"))
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    n = new.select(F.col("doc_id"), F.col("h").alias("h_new"))
    o = old.select(F.col("doc_id"), F.col("h").alias("h_old"))
    joined = n.join(o, "doc_id", "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_new") != F.col("h_old"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select("doc_id", change.alias("change"))
        .where(F.col("change") != "unchanged")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- C61

_C61_ORACLE = f"""
WITH edges AS ({{c52}}),
sym AS (
  SELECT u1, u2 FROM edges
  UNION
  SELECT u2 AS u1, u1 AS u2 FROM edges
),
deg AS (
  SELECT u1 AS u, CAST(COUNT(DISTINCT u2) AS BIGINT) AS n_1hop
  FROM sym GROUP BY u1
),
two AS (
  SELECT DISTINCT a.u1 AS u, b.u2 AS v
  FROM sym a JOIN sym b ON a.u2 = b.u1
  WHERE b.u2 <> a.u1
    AND NOT EXISTS (SELECT 1 FROM sym s WHERE s.u1 = a.u1 AND s.u2 = b.u2)
)
SELECT deg.u AS user_id, deg.n_1hop,
       CAST(COALESCE(t.n2, 0) AS BIGINT) AS n_2hop_new
FROM deg LEFT JOIN (
  SELECT u, COUNT(*) AS n2 FROM two GROUP BY u
) t ON t.u = deg.u
ORDER BY user_id
"""


def _c61_oracle() -> str:
    from .llm_plans8 import _C52_ORACLE

    return _C61_ORACLE.format(c52=_C52_ORACLE)


@register("two_hop_candidates", oracle=_c61_oracle())
def two_hop_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friend-of-friend candidate generation on the behavioral
    similarity graph (C52's edges): per user, the direct-neighbor count
    and the number of NEW nodes reachable in exactly two hops — the
    link-prediction / recommendation candidate pool (two-hop closure is
    where collaborative signals live).

    Scale shape: the classic two-join closure — symmetrised edges,
    one self-join on the middle vertex (degree-bound work, AQE splits
    hubs), direct neighbors removed with a LEFT ANTI join (never a
    per-row EXISTS), distinct at (u, v) grain, counts map-side
    combined. Triangle counting (C55) is the closed form of the same
    join; this is the open form.
    """
    edges = plans_edges_c52(spark, sf_dir).select("u1", "u2")
    # persist, not cut_lineage: measured A/B at sf0.1 (5 legs each),
    # an eager localCheckpoint here re-runs the C52 edge build inside
    # the timed pass and costs 2.21 -> 3.72 s; the persisted frame
    # serves all four branches (deg, both join sides, the anti join)
    # from one materialization.
    sym = edges.union(
        edges.select(F.col("u2").alias("u1"), F.col("u1").alias("u2"))
    ).distinct().persist()
    deg = sym.groupBy(F.col("u1").alias("u")).agg(
        F.count_distinct("u2").alias("n_1hop")
    )
    a = sym.select(F.col("u1").alias("u"), F.col("u2").alias("mid"))
    b = sym.select(F.col("u1").alias("mid"), F.col("u2").alias("v"))
    two = (
        a.join(b, "mid")
        .where(F.col("v") != F.col("u"))
        .select("u", "v")
        .distinct()
        .join(
            sym.select(F.col("u1").alias("u"), F.col("u2").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    )
    n2 = two.groupBy("u").agg(F.count(F.lit(1)).alias("n2"))
    return (
        deg.join(n2, "u", "left")
        .select(
            F.col("u").alias("user_id"),
            F.col("n_1hop").cast("bigint").alias("n_1hop"),
            F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_2hop_new"),
        )
        .orderBy("user_id")
    )


def plans_edges_c52(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import QUERIES

    return QUERIES["user_behavior_similarity"](spark, sf_dir)


# ---------------------------------------------------------------- C62

RFM_BINS = 5

_C62_ORACLE = f"""
WITH purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
horizon AS (SELECT MAX(ts) AS now FROM purchases),
rfm AS (
  SELECT user_id,
         CAST(date_diff('day', MAX(ts), (SELECT now FROM horizon))
              AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         ROUND(SUM(value) + 1e-9, 4) AS monetary
  FROM purchases GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY recency_days, user_id)
            AS BIGINT) AS r_score,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY frequency DESC, user_id)
            AS BIGINT) AS f_score,
       CAST(NTILE({RFM_BINS}) OVER (ORDER BY monetary DESC, user_id)
            AS BIGINT) AS m_score
FROM rfm
ORDER BY user_id
"""


@register("rfm_features", oracle=_C62_ORACLE)
def rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM feature build: per-user recency (days since last purchase,
    relative to the corpus horizon), frequency and monetary totals,
    each quintile-scored with NTILE — the canonical behavioral feature
    block (score 1 = most recent / most frequent / highest spend;
    user_id tie-break keeps the binning deterministic cross-engine).

    Scale shape: the log collapses to user grain in one
    map-side-combined aggregate; the horizon attaches as a broadcast
    scalar; the three NTILEs are global windows over user-grain rows —
    at 100 TB swap for approx_percentile cut-points broadcast onto a
    map-side CASE (same documented switch as C43) — executable via
    SPARK_GRAFT_SCALE_MODE=approx (scale_mode.bucket_by_cuts). Feature-store
    ready: deterministic, point-in-time safe (horizon-relative).
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    horizon = purchases.agg(F.max("ts").alias("now"))
    rfm = (
        purchases.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value") + 1e-9, 4).alias("monetary"),
        )
        .transform(scalars(horizon))
        .select(
            "user_id",
            F.datediff(F.to_date("now"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    if sm.is_approx():
        # quintile boundaries from three sketch aggregates, bucket
        # assignment map-side — no global-order windows
        out = sm.bucket_by_cuts(rfm, "recency_days", RFM_BINS, "r_score")
        out = sm.bucket_by_cuts(
            out, "frequency", RFM_BINS, "f_score", descending=True
        )
        out = sm.bucket_by_cuts(
            out, "monetary", RFM_BINS, "m_score", descending=True
        )
        return out.select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
        ).orderBy("user_id")
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(RFM_BINS)
        .over(Window.orderBy("recency_days", "user_id"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(RFM_BINS)
        .over(Window.orderBy(F.desc("frequency"), F.asc("user_id")))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(RFM_BINS)
        .over(Window.orderBy(F.desc("monetary"), F.asc("user_id")))
        .cast("bigint")
        .alias("m_score"),
    ).orderBy("user_id")
