"""Connected components: known topology + convergence."""

from __future__ import annotations

from etl_guiacores_spark.operators.graph import connected_components


def test_components_known_graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], ["id"])
    # components: {1,2,3,4} (chain), {5,6} (pair), {7} and {8} singletons
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"]
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8}


def test_long_chain_converges(spark):
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert set(got.values()) == {0}
