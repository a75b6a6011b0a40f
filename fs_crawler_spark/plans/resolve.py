"""Post-crawl lazy relationship resolution (SURVEY.md §3.1 resolve step;
reference: fsapi.py:224-235 + graph.py:188-224 + graph_db_impl.py:217-266).

The reference resolves relationship types AFTER the crawl (the "Lazy" mode
that cut 3273 HTTP requests to 527, implementation.notes.md:17-24):
  1. J4: untyped edges joined to the destination vertex's gender,
  2. A4: the grouped resolution rule flags each rel id
     AssumedBiological / Resolve,
  3. the flag is applied to EVERY edge sharing the rel id
     (UPDATE EDGE ... WHERE id = ?, graph_db_impl.py:259-261) — including a
     sibling edge whose destination was never fetched.

Spark shape: two joins + one window-free groupBy; the (id -> type) map is tiny
relative to edges and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph import determine_resolution, resolution_input
from ..schemas import UNTYPED_PARENT


def apply_fact_resolution(edges: DataFrame, rel_facts: DataFrame) -> DataFrame:
    """Stage 2 of lazy resolution (the reference's Resolve-rel fetch,
    fsapi.py:224-235): every edge flagged Resolve is "fetched" against the
    relationship-fact corpus and takes its GedcomX fact type (P5,
    fsapi.py:88-97; last-fact-wins collapses to max_by on a deterministic
    corpus). Non-Resolve edges pass through."""
    facts = rel_facts.groupBy("id").agg(F.max("fact_type").alias("_fact"))
    return (
        edges.join(F.broadcast(facts), on="id", how="left")
        .withColumn(
            "type",
            F.when(
                (F.col("type") == "Resolve") & F.col("_fact").isNotNull(),
                F.col("_fact"),
            ).otherwise(F.col("type")),
        )
        .drop("_fact")
    )


def apply_resolution(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Return edges with UntypedParent rows re-typed per the A4 rule.

    Edges whose rel id produced no resolution (destination never fetched and
    no resolved sibling) keep UntypedParent — same as the reference at crawl
    end (spanning edges stay untyped until their parents are crawled).
    """
    rels = resolution_input(edges, vertices)
    resolved = determine_resolution(rels).withColumnRenamed("type", "_new_type")
    return (
        edges.join(F.broadcast(resolved), on="id", how="left")
        .withColumn(
            "type",
            F.when(
                (F.col("type") == UNTYPED_PARENT) & F.col("_new_type").isNotNull(),
                F.col("_new_type"),
            ).otherwise(F.col("type")),
        )
        .drop("_new_type")
    )
