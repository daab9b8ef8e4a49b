"""Lineage cutting for iterative plans — reliable when it matters.

Iterative operators (connected components, label propagation,
PageRank, Bellman-Ford, k-center rounds ...) must cut lineage every
round or round k's plan replays rounds 1..k-1. ``localCheckpoint`` is
the cheap way — but it stores blocks on executors, so on a real
cluster one lost executor poisons every later round of a long job.

``cut_lineage`` prefers a RELIABLE ``checkpoint`` whenever the session
has a checkpoint directory (set ``SPARK_GRAFT_CHECKPOINT_DIR`` to an
HDFS/S3 path on a cluster — session.py wires it through
``setCheckpointDir``), and falls back to ``localCheckpoint`` on the
bare local rig where executor loss means the JVM died anyway. Both
paths materialize eagerly and preserve partitioning, so callers'
co-partitioning contracts (e.g. label_propagation's fixed edge
partitioning) hold unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and cut its lineage — reliably if the
    session has a checkpoint dir, locally otherwise. Use via
    ``df.transform(cut_lineage)`` inside iterative loops."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:  # pragma: no cover - very old API fallback
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
