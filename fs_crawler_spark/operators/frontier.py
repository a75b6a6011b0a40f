"""Frontier / seen-set set algebra (SURVEY.md F1-F7).

The reference probes per-id membership (graph_memory_impl.py:45-46,
graph_db_impl.py:101-107); a distributed engine never does per-row probes —
the whole family collapses into anti-joins and grouped first-write-wins:

  F1 add_to_frontier   -> left_anti join of candidates vs (seen ∪ processing)
  F2 start_iteration   -> frontier/processing swap = the round barrier
  F4/F5 first-write-wins dedup -> groupBy + min() over a deterministic key
  F7 set difference/union -> left_anti / union

Anti-joins key on (url_hash, url): the long hash drives partitioning/compare
speed, the url equality makes the join exact under hash collision (correctness
never depends on the 64-bit hash). At 10^10 URLs the seen side is a bucketed
Iceberg table (bucket(N, url) transform) so the probe is a storage-partitioned
join; the parquet test impl stores per-round seen deltas partitioned by
``shard = pmod(url_hash, N)`` to model the same layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_hash, url_host

JOIN_KEY = ["url_hash", "url"]


def as_frontier_rows(urls: DataFrame, discovered_iter: int, priority: Column | None = None) -> DataFrame:
    """Canonicalize raw url strings into frontier-schema rows."""
    canon = canonicalize_url(F.col("url"))
    out = urls.select(canon.alias("url")).select(
        "url",
        url_hash(F.col("url")).alias("url_hash"),
        url_host(F.col("url")).alias("host"),
        (priority if priority is not None else F.lit(0.0)).alias("priority"),
        F.lit(discovered_iter).cast("int").alias("discovered_iter"),
    )
    return out


def dedup_frontier(frontier: DataFrame) -> DataFrame:
    """First-write-wins within a frontier batch (F4/F5 analog).

    Deterministic: per url keep min(priority), min(discovered_iter) — not
    ``dropDuplicates`` on unordered input (SURVEY.md §7 hard part (b)).

    Grouping keys are EXACTLY the anti-join keys (url_hash, url) so the
    downstream seen anti-join reuses this aggregate's exchange instead of
    re-shuffling the whole candidate set (one full candidate shuffle per
    crawl round saved). ``host`` is a pure function of the url and is
    recomputed AFTER the aggregate (over the deduped rows) rather than
    carried through it — min(string) would demote the whole-candidate-set
    aggregation from HashAggregate to SortAggregate.
    """
    deduped = frontier.groupBy(*JOIN_KEY).agg(
        F.min("priority").alias("priority"),
        F.min("discovered_iter").alias("discovered_iter"),
    )
    return deduped.select(
        "url_hash",
        "url",
        url_host(F.col("url")).alias("host"),
        "priority",
        "discovered_iter",
    )


def frontier_from_links(links: DataFrame, discovered_iter: int) -> DataFrame:
    """Candidate frontier rows from raw outlink strings — the per-round hot
    path. Equivalent to ``dedup_frontier(as_frontier_rows(links, i))`` for
    the crawl loop, where priority is the shared per-round constant (0.0)
    and discovered_iter a literal: the min() first-write-wins aggregates
    over constants collapse to plain DISTINCT, so the exchange carries ONLY
    (url_hash, url) — no agg buffers, no 12 bytes/row of constant payload.
    Shuffle bytes are the weak-scaling bound on a shared memory bus, so
    row width on this (the largest per-round) exchange is the direct lever.
    Grouping keys stay exactly the seen anti-join keys, so the downstream
    anti-join still reuses this exchange."""
    canon = canonicalize_url(F.col("url"))
    keys = (
        links.select(canon.alias("url"))
        .select(url_hash(F.col("url")).alias("url_hash"), "url")
        .distinct()
    )
    return keys.select(
        "url_hash",
        "url",
        url_host(F.col("url")).alias("host"),
        F.lit(0.0).alias("priority"),
        F.lit(discovered_iter).cast("int").alias("discovered_iter"),
    )


def anti_join_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """F1: drop every candidate whose url is already seen (exact)."""
    return candidates.join(seen.select(*JOIN_KEY), on=JOIN_KEY, how="left_anti")


def anti_join_seen_chain(candidates: DataFrame, seen_parts: list[DataFrame]) -> DataFrame:
    """F1 against an LSM-style probe list: each element of ``seen_parts`` is a
    (url_hash, url) key set ALREADY hash-partitioned on the join keys (and
    sorted within partitions) with the session's shuffle-partition count —
    the crawl loop caches each round's committed seen delta in exactly that
    form. Chained left-antis then plan with ZERO exchange and ZERO sort on
    every pre-partitioned side (InMemoryRelation propagates partitioning +
    ordering), and the candidate side shuffles once — in its own dedup
    aggregate, whose exchange the first join reuses. The per-round
    re-shuffle of the ENTIRE accumulated seen set (the largest recurring
    byte-mover in the loop: O(cumulative fetched) rows per round) disappears;
    measured 2-3x faster per probe at 16 cores. This is the same plan shape
    a bucket(N, url) Iceberg seen table gives via storage-partitioned join —
    modeled here with Spark's own cache instead of table metadata.

    The MERGE hint pins sort-merge on every link: without it, Catalyst
    auto-broadcasts any part whose cached size is under the broadcast
    threshold — re-collecting and re-shipping the part on EVERY round's
    commit (and racing spark.sql.broadcastTimeout when the machine is
    loaded), where the pre-partitioned SMJ streams it with zero exchange,
    zero sort, and no driver involvement."""
    out = candidates
    for part in seen_parts:
        out = out.join(part.hint("merge"), on=JOIN_KEY, how="left_anti")
    return out


def merge_frontier(deferred: DataFrame, fresh: DataFrame) -> DataFrame:
    """Union the deferred (over-budget) frontier with newly discovered urls,
    first-write-wins per url."""
    return dedup_frontier(deferred.unionByName(fresh))


def merge_frontier_fww(deferred: DataFrame, fresh: DataFrame) -> DataFrame:
    """First-write-wins merge where every ``deferred`` row beats every
    ``fresh`` duplicate. Exact whenever fresh rows can never win the min()
    tie-break — true in the crawl loop: fresh candidates carry
    discovered_iter = round+1, strictly greater than anything already queued,
    and priority is the shared constant. The groupBy+min over the whole
    union then collapses to a left-anti of fresh vs deferred: deferred rows
    pass through UNTOUCHED (no shuffle — only their (url_hash, url) keys
    ship to the join), and only fresh crosses an exchange full-width. At a
    budget-constrained frontier deferred ≫ fresh, so the per-round frontier
    merge drops from O(frontier) to O(new urls) shuffle bytes."""
    new_rows = fresh.join(deferred.select(*JOIN_KEY), on=JOIN_KEY, how="left_anti")
    return deferred.unionByName(new_rows.select(*deferred.columns))
