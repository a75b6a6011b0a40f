"""Reference-parity graph analytics tests.

Golden fixtures ported from the reference test suite (FIXTURES.md §6):
resolution rule (tests/model/test_graph.py:100-118), batching
(tests/controller/test_fsapi.py:14-40), hop filtering
(tests/util/test_hop_filtering.py), CSR semantics (tests/util/test_db_reader.py).
"""

import pytest
from pyspark.sql import functions as F

from fs_crawler_spark.batching import partition_requests
from fs_crawler_spark.operators.graph import (
    birth_year,
    classify_edges,
    csr_entries,
    determine_resolution,
    hop_filter,
    invalid_children,
    relationship_counts,
    with_positions,
)


def test_resolution_rule_golden(spark):
    # exact fixture from reference tests/model/test_graph.py:100-118
    relationships = [
        ("Isabella", "9ZT2-JR1", -1),
        ("Isabella", "9ZT2-JR1", 1),
        ("Isabella", "9ZT2-QRF", -1),
        ("Daniel", "M9JK-BT5", -1),
        ("Daniel", "M9JK-BT5", 1),
        ("Barbara", "9VFV-48R", -1),
        ("Barbara", "9VFV-48R", 1),
    ]
    df = spark.createDataFrame(relationships, "source string, id string, color int")
    got = {r["id"]: r["type"] for r in determine_resolution(df).collect()}
    assert got == {
        "9ZT2-QRF": "Resolve",
        "9ZT2-JR1": "Resolve",
        "M9JK-BT5": "AssumedBiological",
        "9VFV-48R": "AssumedBiological",
    }


def test_resolution_rule_duplicates_collapse(spark):
    # duplicate (source, id, color) rows are sets in the reference
    rels = [("A", "R1", -1)] * 3 + [("A", "R2", 1)]
    df = spark.createDataFrame(rels, "source string, id string, color int")
    got = {r["id"]: r["type"] for r in determine_resolution(df).collect()}
    assert got == {"R1": "AssumedBiological", "R2": "AssumedBiological"}


def test_partition_requests_golden():
    # exact fixture from reference tests/controller/test_fsapi.py:14-40
    ids = list(range(23))
    p = partition_requests(ids, 23, 3, 2)
    waves = list(p.iterator)
    assert waves == [
        ((0, 1, 2), (3, 4, 5)),
        ((6, 7, 8), (9, 10, 11)),
        ((12, 13, 14), (15, 16, 17)),
        ((18, 19, 20), (21, 22)),
    ]
    assert p.number_of_partitions == 4

    p = partition_requests(ids, 23, 1, 10)
    waves = list(p.iterator)
    assert waves == [tuple(range(10)), tuple(range(10, 20)), (20, 21, 22)]
    assert p.number_of_partitions == 3


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
            ("V1", "V2", "BiologicalParent", "E1"),  # within
            ("V1", "V3", "UnspecifiedParentType", "E2"),  # within
            ("V1", "V4", "BiologicalParent", "E3"),  # within -> V1 invalid (3 parents)
            ("V3", "V5", "UntypedParent", "E4"),  # within
            ("V4", "X9", "UntypedParent", "E5"),  # spanning
            ("Y1", "Y2", "UntypedParent", "E6"),  # frontier
        ],
        "source string, destination string, type string, id string",
    )
    return vertices, edges


def test_horizon_classification(spark, small_graph):
    vertices, edges = small_graph
    got = {r["id"]: r["class"] for r in classify_edges(edges, vertices).collect()}
    assert got == {
        "E1": "within",
        "E2": "within",
        "E3": "within",
        "E4": "within",
        "E5": "spanning",
        "E6": "frontier",
    }
    counts = relationship_counts(edges, vertices).collect()[0]
    assert (counts["within"], counts["spanning"], counts["frontier"]) == (4, 1, 1)


def test_invalid_children_and_buckets(spark, small_graph):
    vertices, edges = small_graph
    inv = invalid_children(edges, vertices).collect()
    assert len(inv) == 1
    row = inv[0]
    assert row["source"] == "V1"
    assert (row["male"], row["female"], row["unknown"], row["total"]) == (1, 1, 1, 3)
    assert row["bucket"] == "unknown"  # no gender count > 1 -> fallthrough bucket


def test_birth_year_quirks(spark):
    # graph_validator.py:24-35 semantics, including the '-1' substring quirk
    df = spark.createDataFrame(
        [("1912-1993",), ("-1876",), ("Living",), ("",), ("1900-2005",)],
        "lifespan string",
    )
    got = [r[0] for r in df.select(birth_year(F.col("lifespan"))).collect()]
    assert got == [1912, 1876, 3000, 0, 0]


def test_hop_filter(spark, small_graph):
    # mirrors tests/util/test_hop_filtering.py shape: hops filter on both sides
    vertices, edges = small_graph
    v1, e1 = hop_filter(vertices, edges, 1)
    assert v1.count() == 2  # iteration 0 only
    assert {r["id"] for r in e1.collect()} == {"E1"}
    v2, e2 = hop_filter(vertices, edges, 2)
    assert v2.count() == 4
    assert {r["id"] for r in e2.collect()} == {"E1", "E2", "E3"}
    v_all, e_all = hop_filter(vertices, edges, None)
    assert v_all.count() == 5 and e_all.count() == 6


def test_csr_entries(spark, small_graph):
    vertices, edges = small_graph
    vp = with_positions(vertices)  # positions 0..4 by id order V1..V5
    entries = csr_entries(vp, edges).collect()
    got = {(r["row"], r["col"]): r["val"] for r in entries}
    # 5 diagonal entries valued by color
    assert got[(0, 0)] == -1 and got[(1, 1)] == 1 and got[(4, 4)] == 1
    # CSR-type edges only (E1 Biological, E2 Unspecified); val 3 iff dest female
    assert got[(0, 1)] == 3  # V1 -> V2 (female)
    assert got[(0, 2)] == 2  # V1 -> V3 (male)
    assert len(entries) == 5 + 3  # E3 also BiologicalParent -> V4 unknown => 2
    assert got[(0, 3)] == 2


def test_with_positions_distributed_matches_global(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("id"),
        (F.col("doc_id") % 3 - 1).cast("int").alias("color"),
        F.lit(None).cast("string").alias("surname"),
        F.lit(None).cast("string").alias("given_name"),
        F.lit(0).cast("int").alias("iteration"),
        F.lit(None).cast("string").alias("lifespan"),
    )
    a = {r["id"]: r["position"] for r in with_positions(docs).collect()}
    b = {
        r["id"]: r["position"]
        for r in with_positions(docs, distributed=True).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(len(a)))
