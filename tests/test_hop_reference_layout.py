"""Hop filtering against the reference's exact test-graph layout
(tests/util/test_hop_filtering.py:58-107; iteration layout documented at
.plans/hop_implementation_summary.md:63-69: 2 vertices @ iter0, 3 @ iter1,
3 @ iter2, 7 @ iter3 — 15 vertices / 14 edges; expected vertex counts
hops=1 -> 2, 2 -> 5, 3 -> 8, None -> 15)."""

import pytest

from fs_crawler_spark.operators.graph import hop_filter

LAYOUT = [("V%02d" % i, it) for i, it in enumerate(
    [0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3]
)]


@pytest.fixture()
def graph(spark):
    vertices = spark.createDataFrame(
        [(vid, 0, None, None, it, None) for vid, it in LAYOUT],
        "id string, color int, surname string, given_name string, iteration int, lifespan string",
    )
    # a 14-edge tree: each non-root vertex points at a vertex in an earlier layer
    parents = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 5, 10: 6,
               11: 6, 12: 7, 13: 7, 14: 7}
    edges = spark.createDataFrame(
        [
            (LAYOUT[c][0], LAYOUT[p][0], "UntypedParent", f"E{c}")
            for c, p in parents.items()
        ],
        "source string, destination string, type string, id string",
    )
    return vertices, edges


def test_hop_counts_match_reference(spark, graph):
    vertices, edges = graph
    for hops, expect in ((1, 2), (2, 5), (3, 8), (None, 15)):
        v, e = hop_filter(vertices, edges, hops)
        assert v.count() == expect, f"hops={hops}"
        # every surviving edge has both endpoints inside the hop horizon
        ids = {r["id"] for r in v.select("id").collect()}
        for r in e.collect():
            assert r["source"] in ids and r["destination"] in ids
    # edge count at full graph
    _, e_all = hop_filter(vertices, edges, None)
    assert e_all.count() == 14
