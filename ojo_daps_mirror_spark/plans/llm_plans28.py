"""Twenty-eighth sweep (SURVEY.md §2 C87).

The composed RAG indexing chain: chunk → embed (stub) → mean-pool back
to document embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from .llm_plans6 import CHUNK_SIZE, CHUNK_STRIDE
from .vector_plans import VEC_DIMS

# ---------------------------------------------------------------- C87

_C87_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         array_to_string(
           t[(1 + {CHUNK_STRIDE} * j):({CHUNK_STRIDE} * j + {CHUNK_SIZE})],
           ' ') AS chunk_text
  FROM toks,
       unnest(generate_series(
         0, CAST(FLOOR((len(t) - 1) / {CHUNK_STRIDE}.0) AS BIGINT))) AS u(j)
),
vals AS (
  SELECT doc_id, dim,
         ROUND((('0x' || substr(md5(chunk_text || '#' || dim), 1, 8))::BIGINT
                % 1000) / 999.0 - 0.5 + 1e-9, 4) AS v
  FROM chunks
  CROSS JOIN (SELECT unnest(generate_series(0, {VEC_DIMS - 1})) AS dim)
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim,
       {sql_round('AVG(v)', 6)} AS val,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM vals GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""


@register("doc_embedding_from_chunks", oracle=_C87_ORACLE)
def doc_embedding_from_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RAG indexing chain as ONE plan: C46's overlapping
    chunker → A14's deterministic embedding stub per chunk → mean
    pooling back to a document-level vector (the standard
    long-document strategy: embed windows, pool to doc grain for
    coarse retrieval, keep chunk grain for fine).

    Chunking and the per-(chunk, dim) values are pure map expressions
    (the dim axis explodes from a 16-element literal); the ONLY
    shuffle is the final (doc, dim)-grain mean — map-side combined, so
    at 100 TB the chunk stream never lands anywhere. Values round to
    4 dp BEFORE pooling on both sides, so the means are cross-engine
    identical.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = tokens(F.col("text"))
    n_chunks = (F.floor((F.size(t) - 1) / float(CHUNK_STRIDE)) + 1).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.array_join(F.slice(t, 1 + CHUNK_STRIDE * j, CHUNK_SIZE), " "),
    )
    chunks = docs.select("doc_id", F.explode(chunk_arr).alias("chunk_text"))
    dims = F.sequence(F.lit(0), F.lit(VEC_DIMS - 1))
    vals = chunks.select(
        "doc_id",
        F.explode(
            F.transform(
                dims,
                lambda d: F.struct(
                    d.alias("dim"),
                    F.round(
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.col("chunk_text"),
                                            F.lit("#"),
                                            d.cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % 1000
                        )
                        / 999.0
                        - 0.5
                        + 1e-9,
                        4,
                    ).alias("v"),
                ),
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.dim").alias("dim"), F.col("x.v").alias("v"))
    return (
        vals.groupBy("doc_id", "dim")
        .agg(
            round_eps(F.avg("v"), 6).alias("val"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select("doc_id", F.col("dim").cast("bigint").alias("dim"), "val", "n_chunks")
        .orderBy("doc_id", "dim")
    )
