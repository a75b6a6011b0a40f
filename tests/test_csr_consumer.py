"""Golden test for the consumer-side CSR assembly example — same fixture
semantics as test_graph_ops.test_csr_entries (the reference's
tests/util/test_db_reader.py:15-45 red-black matrix shape)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/examples")

from csr_consumer import build_csr, to_dense  # noqa: E402

from fs_crawler_spark.operators.graph import csr_entries, with_positions


@pytest.fixture()
def small_graph(spark):
    vertices = spark.createDataFrame(
        [
            ("V1", -1, "Doe", "John", 0, "1900-1980"),
            ("V2", 1, "Doe", "Jane", 0, "1902-1—"),
            ("V3", -1, "Roe", "Rick", 1, "Living"),
            ("V4", 0, None, None, 1, ""),
            ("V5", 1, "Poe", "Ann", 2, "-1876"),
        ],
        "id string, color int, surname string, given_name string, iteration int, lifespan string",
    )
    edges = spark.createDataFrame(
        [
            ("V1", "V2", "BiologicalParent", "E1"),
            ("V1", "V3", "UnspecifiedParentType", "E2"),
            ("V1", "V4", "BiologicalParent", "E3"),
            ("V3", "V5", "UntypedParent", "E4"),  # not a CSR edge type
        ],
        "source string, destination string, type string, id string",
    )
    return vertices, edges


def test_build_csr_matches_entry_golden(spark, small_graph):
    vertices, edges = small_graph
    vp = with_positions(vertices)  # positions 0..4 by id order V1..V5
    calls = {"progress": 0, "status": []}
    indptr, indices, data = build_csr(
        csr_entries(vp, edges),
        n_vertices=5,
        progress=lambda done, total: calls.__setitem__("progress", (done, total)),
        status=calls["status"].append,
    )
    # CSR invariants
    assert indptr[0] == 0 and indptr[-1] == len(indices) == len(data) == 8
    # dense golden: diagonal colors + edges valued 3 (dest female) / 2
    want = np.zeros((5, 5), dtype=np.int64)
    for i, c in enumerate([-1, 1, -1, 0, 1]):
        want[i, i] = c
    want[0, 1] = 3  # V1 -> V2 female
    want[0, 2] = 2  # V1 -> V3 male
    want[0, 3] = 2  # V1 -> V4 unknown
    got = to_dense(indptr, indices, data, 5)
    assert (got == want).all()
    # per-row column indices sorted (lexsort contract)
    for r in range(5):
        seg = indices[indptr[r] : indptr[r + 1]]
        assert list(seg) == sorted(seg)
    # reference-builder callback seam fired
    assert calls["progress"] == (8, 8)
    assert len(calls["status"]) == 2


def test_build_csr_empty(spark):
    entries = spark.createDataFrame([], "row int, col int, val int")
    indptr, indices, data = build_csr(entries, n_vertices=3)
    assert indptr.tolist() == [0, 0, 0, 0] and len(indices) == 0 and len(data) == 0
