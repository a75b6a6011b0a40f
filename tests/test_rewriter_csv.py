"""J7 rewriter + S6/S7 CSV roundtrip."""

from pyspark.sql import functions as F

from fs_crawler_spark.operators.graph import rewrite_relationships
from fs_crawler_spark.sources.csv_compat import (
    read_edges_csv,
    read_vertices_csv,
    write_graph_csv,
)


def test_rewrite_relationships(spark):
    edges = spark.createDataFrame(
        [
            ("C1", "P1", "UntypedParent", "R1"),
            ("C1", "P2", "UntypedParent", "R1"),
            ("C2", "P3", "BiologicalParent", "R2"),
        ],
        "source string, destination string, type string, id string",
    )
    updates = spark.createDataFrame(
        [("C1", "P1", "StepParent", "R1x")],
        "source string, destination string, new_type string, new_id string",
    )
    out = {
        (r["source"], r["destination"]): (r["type"], r["id"], r["routed"])
        for r in rewrite_relationships(edges, updates).collect()
    }
    assert out[("C1", "P1")] == ("StepParent", "R1x", "aux")  # updated + moved
    assert out[("C1", "P2")] == ("UntypedParent", "R1", "main")
    assert out[("C2", "P3")] == ("BiologicalParent", "R2", "main")


def test_csv_roundtrip(spark, tmp_path):
    vertices = spark.createDataFrame(
        [
            ("V1", -1, "Doe", "John", 0, "1900-1980"),
            ("V2", 1, "Roe", "Jane", 1, "Living"),
        ],
        "id string, color int, surname string, given_name string, iteration int, lifespan string",
    )
    edges = spark.createDataFrame(
        [("V1", "V2", "UntypedParent", "R9")],
        "source string, destination string, type string, id string",
    )
    out = str(tmp_path / "csv")
    write_graph_csv(vertices, edges, out)
    v2 = read_vertices_csv(spark, f"{out}/vertices.csv")
    e2 = read_edges_csv(spark, f"{out}/edges.csv")
    assert sorted(map(tuple, v2.collect())) == sorted(map(tuple, vertices.collect()))
    assert sorted(map(tuple, e2.collect())) == sorted(map(tuple, edges.collect()))
    # reference header compatibility (graph_writer.py:6: name = "surname, given")
    import glob

    header = open(glob.glob(f"{out}/vertices.csv/part-*.csv")[0]).readline().strip()
    assert header.replace('"', "") == "#external_id,color,name,iteration,lifespan"
