"""Canonical engine schemas.

Fixed, hand-declared StructTypes mirroring the reference's fixed SQLite DDL /
CSV headers (reference: fscrawler/model/graph_db_impl.py:29-86,
fscrawler/controller/graph_writer.py:5-7) generalized to the web-crawl data
model mandated by BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input corpus (BASELINE.json input_hint): Iceberg/parquet table of
# Common-Crawl-style pages. "Fetching" a URL = joining the frontier against
# this table (replaces the reference's HTTP GET, fsapi.py:136-137).
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),  # expected extraction output
        StructField("lang", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Crawl state. Frontier/seen generalize FRONTIER_VERTEX / the visited set
# (graph_db_impl.py:67-75, graph_memory_impl.py:30-35).
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),  # xxhash64(canonical url)
        StructField("host", StringType(), False),  # politeness partition key
        StructField("priority", DoubleType(), False),  # per-host queue order
        StructField("discovered_iter", IntegerType(), False),
    ]
)

SEEN = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("discovered_iter", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Crawl outputs. Vertices mirror VERTEX (graph_db_impl.py:29-38) with the
# genealogy columns kept nullable so the same schema serves web pages
# (color/surname/given_name/lifespan null) and reference-parity fixtures.
# ---------------------------------------------------------------------------
VERTICES = StructType(
    [
        StructField("id", StringType(), False),  # canonical url / person id
        StructField("color", IntegerType(), True),  # gender -1/0/1
        StructField("surname", StringType(), True),
        StructField("given_name", StringType(), True),
        StructField("iteration", IntegerType(), False),  # BFS resolve round
        StructField("lifespan", StringType(), True),
    ]
)

# Mirrors EDGE (graph_db_impl.py:39-46): directed child->parent / src->dst.
EDGES = StructType(
    [
        StructField("source", StringType(), False),
        StructField("destination", StringType(), False),
        StructField("type", StringType(), False),
        StructField("id", StringType(), True),  # rel id, first-write-wins
    ]
)

# Per-round metrics, mirrors LOG (graph_db_impl.py:76-86) + north_rule
# per-partition lineage columns.
CRAWL_LOG = StructType(
    [
        StructField("iteration", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),  # -1 = round total
        StructField("duration", DoubleType(), False),
        StructField("vertices", LongType(), False),
        StructField("frontier", LongType(), False),
        StructField("edges", LongType(), False),
        StructField("urls_in", LongType(), False),
        StructField("urls_fetched", LongType(), False),
        StructField("urls_deduped", LongType(), False),
        StructField("snapshot_id", LongType(), False),
    ]
)

# robots.txt rules table: one row per (host, disallowed path prefix).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefix", StringType(), False),
    ]
)

# Extraction UDF output (functions.extract).
EXTRACTED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text", StringType(), True),
        StructField("links", ArrayType(StringType()), True),
    ]
)

# Persons-mode extraction output (P1/P2: persons JSON -> Individual + rels).
PERSON_EXTRACTED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("text", StringType(), True),
        StructField("color", IntegerType(), True),
        StructField("surname", StringType(), True),
        StructField("given_name", StringType(), True),
        StructField("lifespan", StringType(), True),
        StructField(
            "parents",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType(), False),
                        StructField("rel_id", StringType(), False),
                    ]
                )
            ),
            True,
        ),
        StructField("couples", ArrayType(StringType()), True),
    ]
)

# RelationshipType enum values (relationship_types.py:15-27).
UNTYPED_PARENT = "UntypedParent"
ASSUMED_BIOLOGICAL = "AssumedBiological"
RESOLVE = "Resolve"
UNSPECIFIED_PARENT = "UnspecifiedParentType"
UNTYPED_COUPLE = "UntypedCouple"
GEDCOMX_FACT_TYPES = (
    "AdoptiveParent",
    "BiologicalParent",
    "FosterParent",
    "GuardianParent",
    "StepParent",
    "SociologicalParent",
    "SurrogateParent",
)
RELATIONSHIP_TYPES = (
    UNTYPED_PARENT,
    ASSUMED_BIOLOGICAL,
    RESOLVE,
    UNSPECIFIED_PARENT,
    UNTYPED_COUPLE,
) + GEDCOMX_FACT_TYPES
