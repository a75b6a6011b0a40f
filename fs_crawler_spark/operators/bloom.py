"""Sharded advisory bloom pre-filter for the seen-set (SURVEY.md §2.9).

north_rule names a "bloom/cuckoo URL-seen filter". In this engine the bloom
filter is a PRE-PRUNE only: candidates that the filter says are definitely
unseen skip the expensive anti-join probe; "maybe seen" candidates go through
the exact anti-join. Correctness NEVER depends on the false-positive rate
(SURVEY.md §7 hard part (e)) — the exact anti-join is always the authority.

Build: groupBy(shard).applyInPandas — one numpy bitmap per seen-set shard,
the UDAF-analog. Probe: broadcast the shard blobs, mapInPandas membership
test. At 10^10 URLs with 1% fpp the filter is ~12 GB total across shards —
each executor holds only the shards it probes; the driver round-trip here is
the local-mode simplification of an Iceberg puffin-blob / executor-cached
distribution.

Hashing: double-hashing over blake2b(url) — pure stdlib, deterministic
across processes (PYTHONHASHSEED-independent).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_BUILD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("n_items", LongType(), False),
        StructField("bits", BinaryType(), False),
    ]
)


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(url: str, m: int, k: int) -> list[int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [((h1 + i * h2) % m) for i in range(k)]


def build_bloom_shards(
    seen: DataFrame, n_shards: int, expected_per_shard: int = 100_000, fpp: float = 0.01
) -> dict[int, tuple[bytes, int, int]]:
    """One bloom bitmap per seen-set shard -> {shard: (bits, m, k)}."""
    m, k = _params(expected_per_shard, fpp)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        for url in pdf["url"]:
            for pos in _positions(url, m, k):
                bits[pos >> 3] |= 1 << (pos & 7)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "n_items": [len(pdf)], "bits": [bits.tobytes()]}
        )

    shards = (
        seen.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
        .select("shard", "url")
        .groupBy("shard")
        .applyInPandas(build, _BUILD_SCHEMA)
        .collect()
    )
    return {int(r["shard"]): (bytes(r["bits"]), m, k) for r in shards}


def merge_bloom_shards(
    a: dict[int, tuple[bytes, int, int]] | None,
    b: dict[int, tuple[bytes, int, int]],
) -> dict[int, tuple[bytes, int, int]]:
    """Bitwise-OR per-shard bitmaps (incremental build: OR each round's delta
    into the accumulated filter; all blobs share (m, k))."""
    if a is None:
        return dict(b)
    out = dict(a)
    for shard, (bits, m, k) in b.items():
        if shard in out:
            obits, om, ok = out[shard]
            assert (om, ok) == (m, k), "bloom params must match to merge"
            merged = (
                np.frombuffer(obits, dtype=np.uint8) | np.frombuffer(bits, dtype=np.uint8)
            ).tobytes()
            out[shard] = (merged, m, k)
        else:
            out[shard] = (bits, m, k)
    return out


def bloom_prefilter(
    spark: SparkSession,
    candidates: DataFrame,
    shards: dict[int, tuple[bytes, int, int]],
    n_shards: int,
) -> DataFrame:
    """Add ``maybe_seen`` per candidate; rows with maybe_seen = false can skip
    the exact anti-join (they are definitely new)."""
    bc = spark.sparkContext.broadcast(shards)

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("url_hash", LongType(), False),
            StructField("maybe_seen", BooleanType(), False),
        ]
    )

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        blobs = bc.value
        arrays = {
            s: (np.frombuffer(bits, dtype=np.uint8), m, k)
            for s, (bits, m, k) in blobs.items()
        }
        for pdf in it:
            flags = []
            for url, h in zip(pdf["url"], pdf["url_hash"]):
                shard = int(h) % n_shards
                entry = arrays.get(shard)
                if entry is None:
                    flags.append(False)
                    continue
                bits, m, k = entry
                flags.append(
                    all(bits[p >> 3] & (1 << (p & 7)) for p in _positions(url, m, k))
                )
            yield pd.DataFrame(
                {"url": pdf["url"], "url_hash": pdf["url_hash"], "maybe_seen": flags}
            )

    return candidates.select("url", "url_hash").mapInPandas(probe, schema)
