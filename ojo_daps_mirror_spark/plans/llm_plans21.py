"""Twenty-first sweep (SURVEY.md §2 C80–C81).

Semi-structured JSON via the VARIANT type and a Python UDTF twin of the
RAG chunker — the two Spark-4 extension surfaces (open variant encoding,
arrow-optimized table functions) exercised against the same oracles as
their classic counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_eps, sql_round
from ..sources import load_table
from . import register
from .llm_plans6 import CHUNK_SIZE, CHUNK_STRIDE, _C46_ORACLE

# ---------------------------------------------------------------- C80

_C80_ORACLE = f"""
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       {sql_round('AVG(k)', 4)} AS avg_k,
       MAX(k) AS max_k
FROM parsed GROUP BY event_type ORDER BY event_type
"""


@register("props_variant_extract", oracle=_C80_ORACLE)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics through the VARIANT type
    (Spark 4 / open variant encoding): events.props parses ONCE into a
    binary variant column and typed fields extract with variant_get —
    the lakehouse answer to schema-on-read JSON columns. Unlike
    repeated get_json_object calls (A21's per-field re-parse), the
    parse cost is paid once per row regardless of how many paths are
    read, and the binary encoding pushes through shuffles.

    The aggregate itself is one map-side-combined pass to |types| rows;
    the oracle reads the same field with DuckDB's JSON extraction.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    parsed = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            round_eps(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- C81


@register("rag_chunking_udtf", oracle=_C46_ORACLE)
def rag_chunking_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C46 RAG chunker re-expressed as a Python UDTF (user-defined
    TABLE function, Spark 4's extension point for one-row-to-many-rows
    logic that genuinely needs imperative Python) — registered in the
    SQL catalog and invoked with a LATERAL correlate, arrow-optimized
    (the plan shows ArrowEvalPythonUDTF, never row-pickled
    BatchEvalPython).

    Hash-matches C46's oracle EXACTLY: same chunk ids, offsets and
    text. The declarative C46 remains the production path (pure
    codegen, no Python hop); this twin exists to prove the extension
    surface carries the same semantics — the escape hatch a user would
    take for, e.g., a sentence-boundary chunker backed by a Python
    library.
    """
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    size, stride = CHUNK_SIZE, CHUNK_STRIDE

    @udtf(
        returnType=(
            "chunk_id int, start_tok int, n_tok bigint, chunk_text string"
        )
    )
    class Chunker:
        def eval(self, text: str):
            import re

            toks = re.split(r"\s+", text) if text else []
            n = len(toks)
            j = 0
            i = 0
            while i < n or j == 0:
                ct = toks[i : i + size]
                yield j, 1 + stride * j, len(ct), " ".join(ct)
                j += 1
                i += stride

    spark.udtf.register("rag_chunker", Chunker)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("rag_chunk_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.start_tok, c.n_tok, c.chunk_text
        FROM rag_chunk_docs d, LATERAL rag_chunker(d.text) c
        ORDER BY doc_id, chunk_id
        """
    )
