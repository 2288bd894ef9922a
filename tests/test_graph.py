"""Connected components (operators/graph.py): min-label propagation +
pointer jumping over pair graphs."""

import pytest

from gamechanger_data_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df, **kw).collect()
    return {r.id: r.cluster_id for r in rows}


def test_two_components_min_label(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # path 0-1-2-...-9: diameter 9 exercises pointer jumping (plain
    # neighbor-min alone would need 9 rounds; jumping needs ~log2(9))
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_cycle_and_cross_edges(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 2), (2, 9)])
    assert got == {k: 2 for k in (2, 5, 6, 7, 9)}


def test_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)],
                               "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_cluster_assignments_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep)
            for r in dedup_cluster_assignments(docs, pairs).collect()}
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True), 3: (3, True),
        4: (1, False), 5: (1, False),
    }
