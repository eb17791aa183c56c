"""Checkpointed table storage with atomic per-batch commits.

Iceberg is the target table format (north rule), but its runtime jar is
not in this sandbox, so this module implements the same commit semantics
over plain parquet behind a thin interface (SURVEY.md §7 step 3 fallback):

  <root>/batches/batch=<k>/<table>/...parquet     state written by batch k
  <root>/batches/batch=<k>/manifest.json          written LAST, via atomic rename

A batch is committed iff its manifest exists; resume scans for the max
committed batch and reloads exactly that state. Append-only tables (seen
deltas, trace, lineage, docs) are written once per batch and read as a
union of committed batch dirs — no rewrite, which is what keeps the seen
set O(delta) per batch instead of O(10^10). The mutable frontier is
rewritten per batch (the Iceberg path would MERGE instead; swap point is
this module only).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class BatchStore:
    def __init__(self, root: str):
        self.root = root
        self.batches_dir = os.path.join(root, "batches")
        os.makedirs(self.batches_dir, exist_ok=True)

    # --- paths
    def batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.batches_dir, f"batch={batch_id}")

    def table_path(self, batch_id: int, table: str) -> str:
        return os.path.join(self.batch_dir(batch_id), table)

    def manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.batch_dir(batch_id), "manifest.json")

    # --- commit protocol
    def write_table(self, df: DataFrame, batch_id: int, table: str) -> None:
        df.write.mode("overwrite").parquet(self.table_path(batch_id, table))

    def commit(self, batch_id: int, manifest: dict) -> None:
        """Atomic commit: manifest rename is the commit point."""
        payload = dict(manifest, batch_id=batch_id, committed=True)
        fd, tmp = tempfile.mkstemp(dir=self.batch_dir(batch_id), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.manifest_path(batch_id))

    def last_committed(self) -> int | None:
        best = None
        if not os.path.isdir(self.batches_dir):
            return None
        for name in os.listdir(self.batches_dir):
            if not name.startswith("batch="):
                continue
            k = int(name.split("=", 1)[1])
            if os.path.exists(self.manifest_path(k)):
                best = k if best is None else max(best, k)
        return best

    def read_manifest(self, batch_id: int) -> dict:
        with open(self.manifest_path(batch_id)) as f:
            return json.load(f)

    def rollback_uncommitted(self) -> None:
        """Delete any batch dirs newer than the last committed manifest —
        a killed job's partial writes are garbage, never state."""
        last = self.last_committed()
        for name in list(os.listdir(self.batches_dir)):
            if not name.startswith("batch="):
                continue
            k = int(name.split("=", 1)[1])
            if last is None or k > last:
                shutil.rmtree(os.path.join(self.batches_dir, name), ignore_errors=True)

    # --- reads
    def read_table(self, spark: SparkSession, batch_id: int, table: str) -> DataFrame:
        return spark.read.parquet(self.table_path(batch_id, table))

    def read_appendonly(
        self, spark: SparkSession, upto_batch: int, table: str
    ) -> DataFrame | None:
        """Union of an append-only table across committed batches 0..upto."""
        paths = [
            self.table_path(k, table)
            for k in range(-1, upto_batch + 1)  # -1 = the init (seed) batch
            if os.path.isdir(self.table_path(k, table))
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)
