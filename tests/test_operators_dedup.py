"""Connected-components semantics on adversarial topologies."""

from __future__ import annotations

from pyspark.sql import functions as F

from ojo_daps_mirror_spark.operators.dedup import (
    connected_components,
    split_components_by,
)


def _cc(spark, edge_pairs, vertex_ids):
    edges = spark.createDataFrame(edge_pairs, "first_id long, second_id long")
    vertices = spark.createDataFrame([(v,) for v in vertex_ids], "id long")
    rows = connected_components(edges, vertices).collect()
    return {r["id"]: r["component_id"] for r in rows}


def test_long_chain_collapses_to_min(spark):
    # 0-1-2-...-9 chained: diameter 9, all must land on component 0
    edges = [(i, i + 1) for i in range(9)]
    out = _cc(spark, edges, range(10))
    assert out == {i: 0 for i in range(10)}


def test_disjoint_components_and_isolates(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    out = _cc(spark, edges, [1, 2, 3, 10, 11, 20, 21, 22, 99])
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == out[22] == 20
    assert out[99] == 99  # isolated vertex is its own component


def test_edges_given_high_to_low(spark):
    # direction of the edge list must not matter
    out = _cc(spark, [(5, 4), (4, 3)], [3, 4, 5])
    assert out == {3: 3, 4: 3, 5: 3}


def test_split_components_drops_singletons(spark):
    members = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "b", 100), (4, "a", 200)],
        "id long, src string, comp long",
    )
    rows = split_components_by(members, "comp", "src", "id").collect()
    got = {(r["id"]): (r["exemplar_id"], r["is_duplicate"]) for r in rows}
    # comp 100 splits into {1,2} (src a) and {3} (src b, dropped);
    # comp 200 has only {4} (dropped)
    assert got == {1: (1, False), 2: (1, True)}
