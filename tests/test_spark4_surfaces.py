"""Spark 4 API surfaces: Python DataSource, transformWithState kernel,
native XML connector (SURVEY.md §2 D17–D18, C94)."""

from __future__ import annotations

import pandas as pd
import pytest

from ojo_daps_mirror_spark.sources.pydatasource import (
    N_PARTS,
    N_ROWS,
    SyntheticEventsReader,
    register_synthetic_source,
    synth_row,
)


def test_python_datasource_partition_planning():
    """The reader plans N_PARTS covering, non-overlapping ranges —
    the property that makes the custom-source scan parallel."""
    parts = SyntheticEventsReader().partitions()
    assert len(parts) == N_PARTS
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == N_ROWS
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 == s2


def test_python_datasource_scan_matches_closed_form(spark):
    """A full scan through the DataSource API returns exactly the
    closed-form rows, distributed over the planned partitions."""
    register_synthetic_source(spark)
    df = spark.read.format("synthetic_events").load()
    assert df.rdd.getNumPartitions() == N_PARTS
    got = sorted(map(tuple, df.collect()))
    want = sorted(synth_row(i) for i in range(N_ROWS))
    assert got == want


def test_tws_processor_kernel_state_merge():
    """The TWS ProfileProcessor merges batches into ValueState
    correctly — exercised directly (the wire protocol needs protobuf,
    gated in streaming/tws.py:tws_available)."""
    from ojo_daps_mirror_spark.streaming.tws import ProfileProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeState()

    p = ProfileProcessor()
    p.init(FakeHandle())
    b1 = pd.DataFrame({"value": [1.0, 2.0]})
    b2 = pd.DataFrame({"value": [0.5]})
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    assert (int(out1.n_events[0]), float(out1.total_value[0])) == (2, 3.0)
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert (int(out2.n_events[0]), float(out2.total_value[0])) == (3, 3.5)


@pytest.mark.skipif(
    not __import__(
        "ojo_daps_mirror_spark.streaming.tws", fromlist=["tws_available"]
    ).tws_available(),
    reason="transformWithState protocol needs protobuf (not in container)",
)
def test_tws_real_path_runs(spark, sf_dir):
    """When protobuf IS present, the genuine transformWithStateInPandas
    path must produce the batch-equivalent profiles."""
    from ojo_daps_mirror_spark.streaming.tws import streaming_profiles_tws

    out = streaming_profiles_tws(spark, sf_dir)
    assert out.count() > 0


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Native XML connector (new in Spark 4): write a slice of the
    documents table as XML, read it back, contents identical."""
    from ojo_daps_mirror_spark.sources import load_table

    src = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
        .limit(50)
    )
    path = str(tmp_path / "docs_xml")
    src.write.format("xml").option("rowTag", "doc").mode("overwrite").save(path)
    back = spark.read.format("xml").option("rowTag", "doc").load(path)
    assert sorted(map(tuple, back.select("doc_id", "lang", "source").collect())) == (
        sorted(map(tuple, src.collect()))
    )
