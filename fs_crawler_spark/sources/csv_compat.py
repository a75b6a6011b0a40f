"""Reference-schema CSV compatibility exporter/reader (SURVEY.md S6/S7).

The reference's primary sink is six per-crawl CSV files (graph_writer.py:5-7,
78-122; filenames graph_io.py:12-16). The engine's primary sink is the
snapshot store; this module is the byte-compatible exporter so downstream
RedBlackGraph tooling keeps working, plus the reader for CSV-resume (S7).

Headers (graph_writer.py:5-7):
  vertices  #external_id,color,name,iteration,lifespan   (name = "surname, given")
  edges     #source_vertex,destination_vertex,relationship_type,relationship_id
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

VERTEX_HEADER = ["#external_id", "color", "name", "iteration", "lifespan"]
EDGE_HEADER = [
    "#source_vertex",
    "destination_vertex",
    "relationship_type",
    "relationship_id",
]

VERTEX_CSV_SCHEMA = StructType(
    [
        StructField("#external_id", StringType(), False),
        StructField("color", IntegerType(), True),
        StructField("name", StringType(), True),
        StructField("iteration", IntegerType(), True),
        StructField("lifespan", StringType(), True),
    ]
)

EDGE_CSV_SCHEMA = StructType(
    [
        StructField("#source_vertex", StringType(), False),
        StructField("destination_vertex", StringType(), False),
        StructField("relationship_type", StringType(), True),
        StructField("relationship_id", StringType(), True),
    ]
)


def vertices_to_csv_form(vertices: DataFrame, include_living: bool = True) -> DataFrame:
    """Engine vertices -> reference CSV column shape. ``living`` filter analog
    (graph_writer.py:86): living = lifespan == 'Living'."""
    df = vertices
    if not include_living:
        df = df.filter(
            F.col("lifespan").isNull() | (F.col("lifespan") != "Living")
        )
    name = F.when(
        F.col("surname").isNotNull() | F.col("given_name").isNotNull(),
        F.concat_ws(", ", F.col("surname"), F.col("given_name")),
    )
    return df.select(
        F.col("id").alias("#external_id"),
        "color",
        name.alias("name"),
        "iteration",
        "lifespan",
    )


def edges_to_csv_form(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("source").alias("#source_vertex"),
        F.col("destination").alias("destination_vertex"),
        F.col("type").alias("relationship_type"),
        F.col("id").alias("relationship_id"),
    )


def write_graph_csv(
    vertices: DataFrame, edges: DataFrame, out_dir: str, sort: bool = True
) -> None:
    v = vertices_to_csv_form(vertices)
    e = edges_to_csv_form(edges)
    if sort:  # deterministic byte-stable export (SURVEY.md §5 item 2)
        v = v.orderBy("#external_id")
        e = e.orderBy("#source_vertex", "destination_vertex")
    v.write.mode("overwrite").option("header", True).csv(f"{out_dir}/vertices.csv")
    e.write.mode("overwrite").option("header", True).csv(f"{out_dir}/edges.csv")


def read_vertices_csv(spark: SparkSession, path: str) -> DataFrame:
    """S7 resume path: CSV -> engine vertices schema."""
    raw = spark.read.option("header", True).schema(VERTEX_CSV_SCHEMA).csv(path)
    parts = F.split(F.col("name"), ", ", 2)
    return raw.select(
        F.col("#external_id").alias("id"),
        "color",
        parts.getItem(0).alias("surname"),
        parts.getItem(1).alias("given_name"),
        "iteration",
        "lifespan",
    )


def read_edges_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.option("header", True).schema(EDGE_CSV_SCHEMA).csv(path)
    return raw.select(
        F.col("#source_vertex").alias("source"),
        F.col("destination_vertex").alias("destination"),
        F.col("relationship_type").alias("type"),
        F.col("relationship_id").alias("id"),
    )
