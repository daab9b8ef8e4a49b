"""Distributed global ranks and running sums — no single-reducer sort.

``Window.orderBy(...)`` with no ``partitionBy`` forces every row
through ONE task: correct, and fine on the |weeks|/|days|/|cells|
dimension frames most plans rank, but a scale-killer on data-grain
frames (documents, customers) — at 100 TB that task is the job.

``global_order_stats`` computes the same ROW_NUMBER (and optional
running SUMs) over a total order with the classic range-partitioned
two-phase plan:

1. ``repartitionByRange`` on the order columns — Spark's sampled
   range exchange, every partition holds a contiguous key range;
2. one tiny per-partition aggregate (count + sum of each cumsum
   column) → exclusive prefix offsets via a window over the
   |partitions|-row frame;
3. a PARTITIONED window (partitionBy the range-partition id) for the
   local row_number / running sums, plus a broadcast equi-join of the
   offsets: global = partition offset + local.

Both the offset pass and the window pass consume the SAME range
exchange: the two plan branches share an identical repartitionByRange
subtree, which Spark's ReuseExchange rule (spark.sql.exchange.reuse,
on by default; AQE reuses shuffle stages the same way) materializes
once — so the sampled range boundaries, and with them
spark_partition_id, are consistent across branches. The rank
invariant (every output rank appears exactly once) is asserted in
tests/test_operators_rank.py so an environment that ever broke reuse
would fail loudly, and ``persist=True`` forces a materialization for
such environments.

The order must be a TOTAL order (include a unique tiebreak column) —
that is what makes the result independent of where the range
boundaries fall.

``ntile_from_rank`` converts the global row_number into an exact
NTILE(k) bucket (remainder rows in the earlier buckets — the rule
both Spark and DuckDB implement), so quantile bucketing needs no
unpartitioned NTILE window either.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid__"


def _tag_range_partitions(df: DataFrame, order_cols: Sequence[str], persist: bool) -> DataFrame:
    """Range-partition ``df`` on ``order_cols`` and tag each row with
    its partition id. Both consumers of the tagged frame must see the
    SAME sampled range boundaries; that holds via ReuseExchange when
    ``spark.sql.exchange.reuse`` is on (the default). When a caller
    passes ``persist=True`` — or the session has reuse DISABLED, where
    the two plan branches would re-sample boundaries independently and
    could silently disagree — the tagged frame is materialized once
    instead, which makes the invariant unconditional."""
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tagged = df.repartitionByRange(
        n_part, *[F.col(c) for c in order_cols]
    ).withColumn(_PID, F.spark_partition_id())
    reuse = str(spark.conf.get("spark.sql.exchange.reuse", "true")).lower()
    if persist or reuse == "false":
        tagged = tagged.persist()
    return tagged


def global_order_stats(
    df: DataFrame,
    order_cols: Sequence[str],
    rn_col: str = "rn",
    cumsum: Mapping[str, str] | None = None,
    persist: bool = False,
) -> DataFrame:
    """df + a global 1-based ``rn_col`` over ``order_cols`` (and, for
    each ``out: src`` in ``cumsum``, the inclusive running sum of
    ``src``), computed with a range-partitioned sort — never an
    unpartitioned window over the data.

    ``order_cols`` must define a total order (append a unique id).
    Both passes share one range exchange via ReuseExchange (see module
    docstring); pass ``persist=True`` to force a materialization
    instead.
    """
    cumsum = dict(cumsum or {})
    tagged = _tag_range_partitions(df, order_cols, persist)
    per_part = tagged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt__"),
        *[F.sum(src).alias(f"__sum_{out}__") for out, src in cumsum.items()],
    )
    w_prev = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )  # |partitions|-row frame: an unpartitioned window here is fine
    offsets = per_part.select(
        _PID,
        F.coalesce(F.sum("__cnt__").over(w_prev), F.lit(0))
        .cast("bigint")
        .alias("__off__"),
        *[
            F.coalesce(F.sum(f"__sum_{out}__").over(w_prev), F.lit(0))
            .alias(f"__soff_{out}__")
            for out in cumsum
        ],
    )
    w_loc = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    w_run = w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = tagged.select(
        "*",
        F.row_number().over(w_loc).cast("bigint").alias("__loc__"),
        *[
            F.sum(src).over(w_run).alias(f"__run_{out}__")
            for out, src in cumsum.items()
        ],
    )
    out_cols = [c for c in df.columns] + [
        (F.col("__off__") + F.col("__loc__")).cast("bigint").alias(rn_col)
    ]
    for out in cumsum:
        out_cols.append(
            (F.col(f"__soff_{out}__") + F.col(f"__run_{out}__")).alias(out)
        )
    return local.join(F.broadcast(offsets), _PID).select(*out_cols)


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) bucket from a global 1-based rank ``rn`` and the
    total row count ``n``: the first ``n % k`` buckets take
    ``floor(n/k) + 1`` rows, the rest ``floor(n/k)`` — identical to
    the Spark/DuckDB NTILE rule, with no window at all."""
    q = F.floor(n / k)
    r = n % k
    head = r * (q + 1)
    return (
        F.when(rn <= head, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - head) / q))
        .cast("int")
    )


def attach_prev_next(
    df: DataFrame,
    order_cols: Sequence[str],
    prev_map: Mapping[str, str],
    next_map: Mapping[str, str],
    persist: bool = False,
) -> DataFrame:
    """df + the LAG-1 values of ``prev_map`` columns AND the LEAD-1
    values of ``next_map`` columns over one global total order, with no
    unpartitioned window: attach_prev's range-partitioned plan plus the
    symmetric boundary handoff on the lead side (each partition's FIRST
    row ships to the previous non-empty partition's LAST row through
    the same |partitions|-row frame). One range exchange, one sorted
    window pass, one tiny per-partition bounds aggregate — the lead
    side rides the exchange the lag side already pays for.

    First row of the whole order gets NULL prevs; last row gets NULL
    nexts — exactly ``F.lag`` / ``F.lead`` over a global window.
    """
    prev_map = dict(prev_map)
    next_map = dict(next_map)
    tagged = _tag_range_partitions(df, order_cols, persist)
    w_loc = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    w_all = Window.partitionBy(_PID)
    local = tagged.select(
        "*",
        F.row_number().over(w_loc).alias("__rnloc__"),
        F.count(F.lit(1)).over(w_all).alias("__cntloc__"),
        *[
            F.lag(src).over(w_loc).alias(out)
            for out, src in prev_map.items()
        ],
        *[
            F.lead(src).over(w_loc).alias(out)
            for out, src in next_map.items()
        ],
    )
    ordkey = F.struct(*[F.col(c) for c in order_cols])
    bounds = tagged.groupBy(_PID).agg(
        F.max_by(
            F.struct(
                *[F.col(src).alias(out) for out, src in prev_map.items()]
            ),
            ordkey,
        ).alias("__last__"),
        F.min_by(
            F.struct(
                *[F.col(src).alias(out) for out, src in next_map.items()]
            ),
            ordkey,
        ).alias("__firstrow__"),
    )
    # lag/lead over the tiny non-empty-partition frame: the previous
    # non-empty partition's last row feeds this partition's first row,
    # and the next non-empty partition's first row feeds this
    # partition's last row
    wp = Window.orderBy(_PID)
    carry = bounds.select(
        _PID,
        F.lag("__last__").over(wp).alias("__carryp__"),
        F.lead("__firstrow__").over(wp).alias("__carryn__"),
    )
    joined = local.join(F.broadcast(carry), _PID)
    cols = [F.col(c) for c in df.columns]
    cols += [
        F.when(F.col("__rnloc__") == 1, F.col(f"__carryp__.{out}"))
        .otherwise(F.col(out))
        .alias(out)
        for out in prev_map
    ]
    cols += [
        F.when(
            F.col("__rnloc__") == F.col("__cntloc__"),
            F.col(f"__carryn__.{out}"),
        )
        .otherwise(F.col(out))
        .alias(out)
        for out in next_map
    ]
    return joined.select(*cols)


def attach_prev(
    df: DataFrame,
    order_cols: Sequence[str],
    prev_map: Mapping[str, str],
    persist: bool = False,
) -> DataFrame:
    """df + the LAG-1 values of chosen columns over a global total
    order (``out_col: src_col`` in ``prev_map``), with no unpartitioned
    window: a range-partitioned sort, pid-local lag windows, and a
    boundary handoff that ships each partition's LAST row to the next
    non-empty partition's FIRST row through a |partitions|-row frame.
    The first row of the whole order gets NULL prevs, exactly like
    ``F.lag`` over a global window.

    Like ``global_order_stats``, the local-lag branch and the
    boundary-handoff branch must share one range exchange; pass
    ``persist=True`` (or run with ``spark.sql.exchange.reuse=false``,
    which auto-persists) to materialize the tagged frame instead of
    relying on ReuseExchange.
    """
    prev_map = dict(prev_map)
    tagged = _tag_range_partitions(df, order_cols, persist)
    w_loc = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    local = tagged.select(
        "*",
        F.row_number().over(w_loc).alias("__rnloc__"),
        *[
            F.lag(src).over(w_loc).alias(out)
            for out, src in prev_map.items()
        ],
    )
    ordkey = F.struct(*[F.col(c) for c in order_cols])
    lasts = tagged.groupBy(_PID).agg(
        F.max_by(
            F.struct(*[F.col(src).alias(out) for out, src in prev_map.items()]),
            ordkey,
        ).alias("__last__")
    )
    # lag over the tiny non-empty-partition frame: the previous
    # NON-EMPTY partition's last row feeds this partition's first row
    carry = lasts.select(
        _PID,
        F.lag("__last__").over(Window.orderBy(_PID)).alias("__carry__"),
    )
    joined = local.join(F.broadcast(carry), _PID)
    cols = [F.col(c) for c in df.columns] + [
        F.when(F.col("__rnloc__") == 1, F.col(f"__carry__.{out}"))
        .otherwise(F.col(out))
        .alias(out)
        for out in prev_map
    ]
    return joined.select(*cols)
