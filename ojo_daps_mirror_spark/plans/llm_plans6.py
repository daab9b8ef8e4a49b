"""LLM training-data plans, sixth sweep (SURVEY.md §2 C45–C48).

BPE merge-pair statistics (tokenizer training's inner loop), RAG-style
overlapping chunking, incremental MinHash dedup of a new batch against
an existing index, and per-cluster embedding statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..functions.text import sql_hash64, sql_shingles, sql_tokens, tokens
from ..sources import load_table
from . import register
from .text_plans import (
    JACCARD_THRESHOLD,
    MH_A,
    MH_B,
    MH_BUCKET_CAP,
    MH_PERMS,
    MH_PRIME,
    MH_ROWS_PER_BAND,
    MH_SHINGLE_K,
    _jaccard_verify,
    minhash_bands,
)

# ---------------------------------------------------------------- C45

BPE_TOP_PAIRS = 30

_C45_ORACLE = f"""
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest({sql_tokens("text")}) AS word FROM documents)
  GROUP BY word
),
chars AS (
  SELECT word, n, regexp_extract_all(word, '.') AS cs FROM words
),
pairs AS (
  SELECT n,
         unnest(list_transform(
           generate_series(1, len(cs) - 1),
           i -> cs[i] || ' ' || cs[i + 1])) AS pair
  FROM chars
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


@register("bpe_pair_counts", oracle=_C45_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-pair statistics — the inner loop of byte-pair-encoding
    tokenizer training: count adjacent symbol pairs across the corpus,
    weighted by word frequency; the top pair is the next merge.

    Scale shape: the classic BPE trick — pair counting runs on the
    DISTINCT-WORD table (vocab-sized, ~10⁵–10⁶ rows regardless of
    corpus size), never on the token stream: one map-side-combined
    word count collapses 100 TB of text to a vocab table, char-pair
    expansion is a per-row array expression on that table, and the
    final pair count + TakeOrderedAndProject top-k are both tiny.
    Subsequent merge rounds re-run the same plan over the re-segmented
    vocab — each round is corpus-size-independent.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cs = F.expr("regexp_extract_all(word, '.', 0)")
    pair_arr = F.zip_with(
        cs,
        F.slice(cs, 2, F.greatest(F.size(cs) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pairs = words.select(
        "n",
        F.explode(
            F.slice(pair_arr, 1, F.greatest(F.size(cs) - 1, F.lit(0)))
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


# ---------------------------------------------------------------- C46

CHUNK_SIZE = 32  # tokens per retrieval chunk
CHUNK_STRIDE = 24  # 8-token overlap between neighbours

_C46_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
)
SELECT doc_id,
       j AS chunk_id,
       1 + {CHUNK_STRIDE} * j AS start_tok,
       CAST(len(t[(1 + {CHUNK_STRIDE} * j):({CHUNK_STRIDE} * j + {CHUNK_SIZE})])
            AS BIGINT) AS n_tok,
       array_to_string(
         t[(1 + {CHUNK_STRIDE} * j):({CHUNK_STRIDE} * j + {CHUNK_SIZE})],
         ' ') AS chunk_text
FROM toks,
     unnest(generate_series(
       0, CAST(FLOOR((len(t) - 1) / {CHUNK_STRIDE}.0) AS BIGINT))) AS u(j)
ORDER BY doc_id, chunk_id
"""


@register("rag_chunking", oracle=_C46_ORACLE)
def rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking for retrieval indexing: fixed
    {CHUNK_SIZE}-token chunks every {CHUNK_STRIDE} tokens (8-token
    overlap so no boundary-spanning passage is lost), with stable
    chunk ids and token offsets — the document-prep stage of every
    RAG / embedding-index pipeline.

    Scale shape: pure map-side — one sequence+posexplode per doc, no
    shuffle at all except the presentation sort; the chunk stream
    feeds straight into vectorise/ANN (A14 → C8/C9/C15) without
    touching a reducer. Output grain is ~tokens/stride rows per doc.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tokens(F.col("text"))
    n_chunks = (F.floor((F.size(t) - 1) / float(CHUNK_STRIDE)) + 1).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            (1 + CHUNK_STRIDE * j).alias("start_tok"),
            F.slice(t, 1 + CHUNK_STRIDE * j, CHUNK_SIZE).alias("ct"),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunk_arr).alias("chunk_id", "c"))
        .select(
            "doc_id",
            "chunk_id",
            F.col("c.start_tok").alias("start_tok"),
            F.size("c.ct").cast("bigint").alias("n_tok"),
            F.array_join("c.ct", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------- C47

PROBE_MOD = 10  # doc_id % 10 == 7 plays the newly-arrived batch
PROBE_REM = 7

_MH_A_SQL = "[" + ", ".join(map(str, MH_A)) + "]"
_MH_B_SQL = "[" + ", ".join(map(str, MH_B)) + "]"

_C47_ORACLE = f"""
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
cand AS (
  SELECT DISTINCT n.doc_id AS i, x.doc_id AS j
  FROM bands n JOIN bands x ON n.band = x.band AND n.sig = x.sig
  WHERE n.doc_id % {PROBE_MOD} = {PROBE_REM}
    AND x.doc_id % {PROBE_MOD} <> {PROBE_REM}
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


@register("incremental_minhash_dedup", oracle=_C47_ORACLE)
def incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a newly-arrived batch (doc_id % {PROBE_MOD}
    == {PROBE_REM}) probed against the EXISTING corpus index — the
    production shape of MinHash dedup, where each ingest batch checks
    itself against an already-materialised signature store instead of
    re-running the whole-corpus self-join (C5).

    Scale shape: band signatures come from the same map-side builder
    as C5 (`minhash_bands` — in production the index side is a
    PERSISTED table, written once per corpus build, so only the small
    batch computes signatures at ingest time); candidates are an
    equi-join of the tiny batch band-list against the index band-list
    (batch side broadcast — no self-join, no bucket pair expansion);
    exact-Jaccard verify touches only colliding pairs. The no-match
    batch docs are the novel set that enters the corpus.
    """
    raw = load_table(spark, sf_dir, "documents")
    bands = minhash_bands(raw)
    is_new = F.col("doc_id") % PROBE_MOD == PROBE_REM
    new_bands = bands.where(is_new).withColumnRenamed("doc_id", "i")
    idx_bands = bands.where(~is_new).withColumnRenamed("doc_id", "j")
    cand = (
        F.broadcast(new_bands)
        .join(idx_bands, ["band", "sig"])
        .select("i", "j")
        .distinct()
    )
    return _jaccard_verify(raw, cand, MH_SHINGLE_K)


# ---------------------------------------------------------------- C48

_C48_ORACLE = f"""
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
per_dim AS (
  SELECT label, dim, AVG(v) AS mu, AVG(v * v) AS m2,
         COUNT(*) AS n
  FROM dims GROUP BY label, dim
)
SELECT label,
       CAST(MIN(n) AS BIGINT) AS n_vecs,
       {sql_round("SQRT(SUM(mu * mu))", 4)} AS centroid_norm,
       {sql_round("SUM(m2 - mu * mu)", 4)} AS mean_sq_dist
FROM per_dim
GROUP BY label
ORDER BY label
"""


@register("embedding_cluster_stats", oracle=_C48_ORACLE)
def embedding_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding statistics: member count, centroid norm,
    and mean squared distance to the centroid — the cluster-quality
    report behind codebook sizing (C15/C25) and embedding-space drift
    monitoring.

    The within-cluster spread uses the one-pass identity
    E‖x−c‖² = Σ_d (E[x_d²] − E[x_d]²): no second join against the
    centroid, no per-pair distances.

    Scale shape: one posexplode to (label, dim) grain — |labels|·dim
    groups, map-side combined — then a |labels|-row final aggregate.
    The whole 100 TB embedding table reduces in a single shuffle of
    partial sums; nothing per-vector crosses the wire.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.avg("v").alias("mu"),
        F.avg(F.col("v") * F.col("v")).alias("m2"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.min("n").cast("bigint").alias("n_vecs"),
            round_eps(F.sqrt(F.sum(F.col("mu") * F.col("mu"))), 4).alias(
                "centroid_norm"
            ),
            round_eps(F.sum(F.col("m2") - F.col("mu") * F.col("mu")), 4).alias(
                "mean_sq_dist"
            ),
        )
        .orderBy("label")
    )
