"""Custom connector via Spark 4's Python DataSource API (SPARK-44076).

The extension point for sources Spark doesn't ship: the reader
declares its own InputPartitions (so the scan parallelises across
executors exactly like a file scan) and yields Arrow-friendly tuples
per partition. This synthetic source stands in for the reference's
scrape/API collectors (ojd_daps/flows/extract/reed.py pulls job ads
from a REST API page by page — page ranges ARE the partitions): a
production twin would put one API page/shard per InputPartition and
fetch inside read(), giving a parallel, restartable ingest with no
driver bottleneck.

Determinism: every row is a closed-form function of event_id, so the
whole table is reproducible from (N_ROWS, N_PARTS) alone — which is
what lets a DuckDB generate_series oracle hash-match a scan of this
source end-to-end.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_ROWS = 10_000
N_PARTS = 8
N_USERS = 97  # prime, so user_id cycles hit every residue
EVENT_TYPES = ("view", "click", "purchase")


def synth_row(i: int) -> tuple:
    """Closed-form row i — keep in sync with the SQL twin below."""
    return (
        i,
        i % N_USERS,
        EVENT_TYPES[(i * 31) % 3],
        ((i * 7919) % 10_000) / 100.0,
    )


# DuckDB twin of synth_row over generate_series(0, N_ROWS-1).
SYNTH_SQL = f"""
SELECT i AS event_id,
       i % {N_USERS} AS user_id,
       list_value('view', 'click', 'purchase')[(i * 31) % 3 + 1] AS event_type,
       ((i * 7919) % 10000) / 100.0 AS value
FROM generate_series(0, {N_ROWS - 1}) AS t(i)
"""


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def partitions(self) -> list[InputPartition]:
        step = (N_ROWS + N_PARTS - 1) // N_PARTS
        return [
            RangePartition(lo, min(lo + step, N_ROWS))
            for lo in range(0, N_ROWS, step)
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") — register with
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader()


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
