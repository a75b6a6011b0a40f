"""Iceberg-native snapshot store (SURVEY.md S4/S5; north_rule "over Iceberg
tables") — the production backend the parquet ``CheckpointStore`` models.

Same surface as ``CheckpointStore`` (commit / read / read_union / manifest /
committed_rounds / latest_round / aux_* / append), so ``run_crawl(...,
store=IcebergCheckpointStore(spark, "cat.crawl_ns"))`` is a drop-in swap.
Mapping:

  * logical table X -> one Iceberg table ``{namespace}.X``; per-round deltas
    of append tables (seen, vertices, edges, crawl_log) are APPEND commits,
    the frontier (replace table) is an overwrite commit;
  * the seen table is ``bucket(n_shards, url)``-partitioned — the per-round
    candidates anti-join against it becomes a STORAGE-PARTITIONED JOIN
    (SPARK-37375): no shuffle of the seen side, the layout the parquet store
    models with shard=pmod(url_hash, N) directory partitions;
  * a crawl round is committed by appending ONE row to the tiny
    ``{namespace}.round_manifests`` table — written LAST, so a round exists
    iff its manifest row does (the parquet store's MANIFEST.json analog; a
    killed run resumes from the previous round exactly);
  * each manifest row records the per-table Iceberg snapshot ids the round
    produced, so ``read(round, name)`` is an incremental scan
    (start/end-snapshot-id) and ``read_union(name)`` is just the table —
    Iceberg IS the union of its appends.

The sandbox image has no Iceberg runtime jar or catalog, so this module is
exercised end-to-end only when ``iceberg_available(spark)`` — tests skip
cleanly otherwise; the manifest codec and identifier handling are unit-tested
unconditionally. Reference analog: the SQLite dump-on-close sink
(fscrawler/graph_db_impl.py:268-290) — one durable snapshot per run there,
one per ROUND here.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

APPEND_TABLES = ("seen", "vertices", "edges", "crawl_log")
MANIFEST_TABLE = "round_manifests"

_MANIFEST_SCHEMA = (
    "round int, snapshot_id long, tables string, compacted string, "
    "meta string, table_snapshots string"
)


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True iff an Iceberg catalog is configured in this session. When
    ``catalog`` is None, checks any ``spark.sql.catalog.*`` entry whose
    implementation mentions iceberg."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    for k, v in confs:
        if not k.startswith("spark.sql.catalog."):
            continue
        if catalog is not None and k != f"spark.sql.catalog.{catalog}":
            continue
        if "iceberg" in str(v).lower():
            return True
    return False


def encode_manifest(manifest: dict[str, Any]) -> tuple:
    """Manifest dict -> a row for the round_manifests table (pure)."""
    return (
        int(manifest["round"]),
        int(manifest["snapshot_id"]),
        json.dumps(sorted(manifest.get("tables", []))),
        json.dumps(sorted(manifest.get("compacted", []))),
        json.dumps(manifest.get("meta", {})),
        json.dumps(manifest.get("table_snapshots", {})),
    )


def decode_manifest(row: Any) -> dict[str, Any]:
    """round_manifests row -> the manifest dict CheckpointStore callers see
    (pure inverse of encode_manifest)."""
    return {
        "round": int(row["round"]),
        "snapshot_id": int(row["snapshot_id"]),
        "tables": json.loads(row["tables"]),
        "compacted": json.loads(row["compacted"]),
        "meta": json.loads(row["meta"]),
        "table_snapshots": json.loads(row["table_snapshots"]),
    }


class IcebergCheckpointStore:
    def __init__(
        self, spark: SparkSession, namespace: str, n_shards: int = 32
    ) -> None:
        """``namespace`` is a fully qualified Iceberg namespace, e.g.
        ``my_catalog.crawl_run_7``; it is created if absent."""
        if not iceberg_available(spark, namespace.split(".", 1)[0]):
            raise RuntimeError(
                f"no Iceberg catalog configured for '{namespace}' — use the "
                "parquet CheckpointStore, or add the iceberg-spark-runtime "
                "jar and a spark.sql.catalog.<name> configuration"
            )
        self.spark = spark
        self.namespace = namespace
        self.n_shards = n_shards
        self.root = namespace  # parity with CheckpointStore diagnostics
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    # -- identifiers ---------------------------------------------------------
    def _tbl(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    def _last_snapshot_id(self, name: str) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(name)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row else -1

    # -- write path -----------------------------------------------------------
    def _write_table(self, name: str, df: DataFrame) -> tuple[int, int]:
        """Write one logical table for this round; returns the (start, end]
        Iceberg snapshot-id range the round's rows occupy."""
        start = self._last_snapshot_id(name) if self._exists(name) else -1
        writer = df.writeTo(self._tbl(name))
        if name == "seen":
            # bucket-partitioned seen-set => storage-partitioned anti-join
            writer = writer.partitionedBy(F.bucket(self.n_shards, F.col("url")))
        if name in APPEND_TABLES:
            if self._exists(name):
                writer.append()
            else:
                writer.create()
        else:  # replace tables (frontier): the round's table is the whole state
            writer.createOrReplace()
        return start, self._last_snapshot_id(name)

    def commit(
        self,
        round_i: int,
        tables: dict[str, DataFrame],
        meta: dict[str, Any] | None = None,
        partition_by: dict[str, list[str]] | None = None,  # layout is table-
        # level in Iceberg (bucket spec above); accepted for surface parity
        compacted: list[str] | None = None,
        snapshot_id: int | None = None,
    ) -> int:
        import time

        snapshot_id = snapshot_id or time.time_ns()
        table_snapshots: dict[str, list[int]] = {}
        for name, df in tables.items():
            if name in (compacted or []) and self._exists(name):
                # compaction: the full rewrite REPLACES the table content
                self.spark.sql(f"DELETE FROM {self._tbl(name)} WHERE true")
                start = self._last_snapshot_id(name)
                df.writeTo(self._tbl(name)).append()
                table_snapshots[name] = [start, self._last_snapshot_id(name)]
            else:
                table_snapshots[name] = list(self._write_table(name, df))
        manifest = {
            "round": round_i,
            "snapshot_id": snapshot_id,
            "tables": sorted(tables),
            "compacted": sorted(compacted or []),
            "meta": meta or {},
            "table_snapshots": table_snapshots,
        }
        row_df = self.spark.createDataFrame(
            [encode_manifest(manifest)], _MANIFEST_SCHEMA
        )
        if self._exists(MANIFEST_TABLE):
            row_df.writeTo(self._tbl(MANIFEST_TABLE)).append()  # commit point
        else:
            row_df.writeTo(self._tbl(MANIFEST_TABLE)).create()
        return snapshot_id

    # -- aux blobs -------------------------------------------------------------
    def aux_write(self, round_i: int, name: str, df: DataFrame) -> None:
        out = df.withColumn("_round", F.lit(round_i).cast("int"))
        out.writeTo(self._tbl(f"aux_{name}")).createOrReplace()

    def aux_read(self, spark: SparkSession, round_i: int, name: str) -> DataFrame:
        df = spark.read.table(self._tbl(f"aux_{name}"))
        return df.filter(F.col("_round") == round_i).drop("_round")

    def append(self, round_i: int, name: str, df: DataFrame) -> None:
        df.writeTo(self._tbl(name)).append()

    # -- read path --------------------------------------------------------------
    def committed_rounds(self) -> list[int]:
        if not self._exists(MANIFEST_TABLE):
            return []
        rows = self.spark.read.table(self._tbl(MANIFEST_TABLE)).select("round").collect()
        return sorted(int(r[0]) for r in rows)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def manifest(self, round_i: int) -> dict[str, Any]:
        row = (
            self.spark.read.table(self._tbl(MANIFEST_TABLE))
            .filter(F.col("round") == round_i)
            .collect()
        )
        if not row:
            raise FileNotFoundError(f"round {round_i} not committed in {self.namespace}")
        return decode_manifest(row[0])

    def read(self, spark: SparkSession, round_i: int, name: str) -> DataFrame:
        """This round's rows of a table. Append tables: incremental scan over
        the round's snapshot range; crawl_log additionally sees post-commit
        flush appends, so it reads the full table (callers filter on
        iteration). Replace tables: current content (only the latest round's
        frontier is ever read)."""
        if name == "crawl_log" or name not in APPEND_TABLES:
            return spark.read.table(self._tbl(name))
        snaps = self.manifest(round_i)["table_snapshots"].get(name)
        reader = spark.read.format("iceberg")
        if snaps and snaps[0] >= 0:
            reader = reader.option("start-snapshot-id", snaps[0]).option(
                "end-snapshot-id", snaps[1]
            )
        return reader.load(self._tbl(name))

    def read_union(
        self, spark: SparkSession, name: str, up_to_round: int | None = None
    ) -> DataFrame | None:
        """Iceberg IS the union of its appends; time-travel bounds it when a
        historical view is requested."""
        if not self._exists(name):
            return None
        if up_to_round is not None and up_to_round != self.latest_round():
            snaps = self.manifest(up_to_round)["table_snapshots"].get(name)
            if snaps:
                return (
                    spark.read.format("iceberg")
                    .option("snapshot-id", snaps[1])
                    .load(self._tbl(name))
                )
        return spark.read.table(self._tbl(name))
