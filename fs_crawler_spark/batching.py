"""Reference-parity request-wave partitioning (SURVEY.md B1).

The reference splits a 1-D id stream into cells of ≤ ``max_ids_per_request``
ids and waves of ≤ ``max_concurrent_requests`` cells (fsapi.py:43-69; defaults
200×40 at fsapi.py:24-28). In the engine this shape governs how many corpus
rows one Arrow batch / one politeness round carries; the pure function is kept
(and golden-tested, tests/controller/test_fsapi.py:14-40) because wave math
also sizes the per-host budget: budget_per_round = cells × ids-per-cell.

Driver-side only — the distributed analog is operators.politeness.
"""

from __future__ import annotations

from itertools import islice
from math import ceil
from typing import Iterable, Iterator, NamedTuple

MAX_PERSONS = 200
MAX_CONCURRENT_PERSON_REQUESTS = 40
MAX_CONCURRENT_RELATIONSHIP_REQUESTS = 200


class PartitionedRequest(NamedTuple):
    number_of_partitions: int
    iterator: Iterator[tuple]


def _grouper(iterable: Iterable, n: int) -> Iterator[tuple]:
    it = iter(iterable)
    while True:
        chunk = tuple(islice(it, n))
        if not chunk:
            return
        yield chunk


def partition_requests(
    ids: Iterable,
    count: int,
    max_ids_per_request: int = MAX_PERSONS,
    max_concurrent_requests: int = MAX_CONCURRENT_PERSON_REQUESTS,
) -> PartitionedRequest:
    """Split ids into waves of concurrent request cells (reference semantics)."""
    grouped = _grouper(ids, max_ids_per_request) if max_ids_per_request > 1 else ids
    return PartitionedRequest(
        ceil(count / max_concurrent_requests / max_ids_per_request),
        _grouper(grouped, max_concurrent_requests),
    )
