"""Backup / restore with manifest, checksum, retention, and verify.

Reference: /root/reference/memory_core/migration/backup_manager.py —
strategies full/incremental/differential (:20-25), BackupConfig with
retention + verify (:38-51), create_backup writes a checksummed backup
file + index (:134-224), restore (:226-285), list/delete (:286-312),
retention cleanup (:531-545).

Spark-first: a backup is a DIRECTORY of parquet tables plus a JSON
manifest — written and verified distributed (the reference serializes
every node through the driver into one JSON file; here only the O(1)
manifest touches the driver). The content checksum is an
order-independent aggregate (sum of xxhash64 over canonical row JSON),
so verification is a scan, not a byte-compare. Incremental /
differential backups store only rows absent from the base (exceptAll)
and restore by key-overlay.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BACKUP_STRATEGIES = ["full", "incremental", "differential"]


def table_checksum(df: DataFrame) -> int:
    """Order-independent content checksum: sum of xxhash64 over the
    canonical (sorted-struct) JSON of each row. Distributed; one scan."""
    canon = F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)]))
    # decimal accumulator: a long sum of xxhash64 values overflows under
    # ANSI mode
    row = df.select(F.coalesce(
        F.sum(F.xxhash64(canon).cast("decimal(38,0)")),
        F.lit(0).cast("decimal(38,0)")).alias("c")).first()
    return int(row["c"])


class BackupManager:
    """Directory-of-parquet backups with manifest + retention + verify."""

    def __init__(self, spark: SparkSession, backup_dir: str,
                 retention_days: float = 30.0, verify: bool = True):
        self.spark = spark
        self.dir = backup_dir
        self.retention_days = retention_days
        self.verify = verify
        os.makedirs(backup_dir, exist_ok=True)

    # -- index --------------------------------------------------------------
    def _index_path(self) -> str:
        return os.path.join(self.dir, "index.json")

    def _load_index(self) -> dict:
        try:
            with open(self._index_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _save_index(self, idx: dict) -> None:
        tmp = self._index_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(idx, fh, indent=2, sort_keys=True)
        os.replace(tmp, self._index_path())

    def list_backups(self) -> list[dict]:
        return sorted(self._load_index().values(), key=lambda b: b["timestamp"])

    def delete_backup(self, backup_id: str) -> bool:
        idx = self._load_index()
        if backup_id not in idx:
            return False
        shutil.rmtree(os.path.join(self.dir, backup_id), ignore_errors=True)
        del idx[backup_id]
        self._save_index(idx)
        return True

    # -- create -------------------------------------------------------------
    def create_backup(self, tables: dict[str, DataFrame],
                      backup_id: str | None = None, strategy: str = "full",
                      base_backup_id: str | None = None,
                      key_cols: dict[str, str] | None = None) -> dict:
        """Back up the given tables. ``full`` stores everything;
        ``incremental``/``differential`` store only rows NOT present in
        the base backup (incremental: any previous backup id;
        differential: must name a full backup), restoring by key-overlay
        via ``key_cols`` (table → key column). Deletions are NOT
        represented in deltas (same as the reference's incremental
        strategy): a row absent from ``tables`` but present in the base
        survives restore — take a full backup to compact deletions."""
        if strategy not in BACKUP_STRATEGIES:
            raise ValueError(f"unknown strategy {strategy!r}")
        if strategy != "full":
            if base_backup_id is None:
                raise ValueError(f"{strategy} backup requires base_backup_id")
            # every table needs a key or restore would return only the
            # delta rows for it, silently losing the base
            missing = sorted(set(tables) - set(key_cols or {}))
            if missing:
                raise ValueError(
                    f"{strategy} backup requires key_cols for every table; "
                    f"missing: {missing}")
            base = self.restore_backup(base_backup_id)
        backup_id = backup_id or f"backup_{int(time.time() * 1000)}"
        dest = os.path.join(self.dir, backup_id)
        manifest: dict = {
            "backup_id": backup_id, "timestamp": time.time(),
            "strategy": strategy, "base_backup_id": base_backup_id,
            "key_cols": key_cols or {}, "tables": {},
        }
        for name, df in tables.items():
            out = df
            if strategy != "full" and name in base:
                out = df.exceptAll(base[name].select(*df.columns))
            path = os.path.join(dest, name)
            out.write.mode("overwrite").parquet(path)
            back = self.spark.read.parquet(path)
            manifest["tables"][name] = {
                "rows": back.count(), "checksum": table_checksum(back)}
        with open(os.path.join(dest, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        if self.verify:
            self.verify_backup(backup_id, manifest)
        idx = self._load_index()
        idx[backup_id] = {k: manifest[k] for k in
                          ("backup_id", "timestamp", "strategy", "base_backup_id")}
        idx[backup_id]["node_like_rows"] = sum(
            t["rows"] for t in manifest["tables"].values())
        self._save_index(idx)
        self._cleanup()
        return manifest

    def _manifest(self, backup_id: str) -> dict:
        with open(os.path.join(self.dir, backup_id, "manifest.json")) as fh:
            return json.load(fh)

    def verify_backup(self, backup_id: str, manifest: dict | None = None) -> bool:
        """Re-read every table and recompute row count + checksum against
        the manifest (backup_manager.py:456-476)."""
        manifest = manifest or self._manifest(backup_id)
        for name, info in manifest["tables"].items():
            df = self.spark.read.parquet(os.path.join(self.dir, backup_id, name))
            if df.count() != info["rows"] or table_checksum(df) != info["checksum"]:
                raise ValueError(
                    f"backup {backup_id!r} table {name!r} failed verification")
        return True

    # -- restore ------------------------------------------------------------
    def restore_backup(self, backup_id: str) -> dict[str, DataFrame]:
        """Reconstruct the table set: full backups read directly;
        incremental/differential read the base chain and overlay by key
        (backup rows win)."""
        m = self._manifest(backup_id)
        own = {name: self.spark.read.parquet(os.path.join(self.dir, backup_id, name))
               for name in m["tables"]}
        if m["strategy"] == "full":
            return own
        from memory_engine_spark.operators.merging import upsert

        base = self.restore_backup(m["base_backup_id"])
        out = dict(base)
        for name, df in own.items():
            key = m["key_cols"].get(name)
            if name in base and key:
                out[name] = upsert(base[name].select(*df.columns), df, key)
            else:
                out[name] = df
        return out

    def _cleanup(self) -> None:
        """Retention policy (backup_manager.py:531-545): drop backups
        older than retention_days, never dropping a base another backup
        still chains to."""
        if self.retention_days <= 0:
            return
        idx = self._load_index()
        cutoff = time.time() - self.retention_days * 86400
        bases = {b.get("base_backup_id") for b in idx.values()}
        for bid in [b for b, info in idx.items()
                    if info["timestamp"] < cutoff and b not in bases]:
            self.delete_backup(bid)
