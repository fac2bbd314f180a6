"""Columnar / row format readers-writers beyond the reference's
import-export set: Parquet (the engine's native layout), ORC, JSONL,
CSV, and Avro when the spark-avro package is on the classpath.

The reference's importers parse whole files driver-side
(/root/reference/memory_core/migration/data_importer.py); here every
format maps to a Spark DataSource so reads are distributed, schema is
pruned at the scan, and predicate pushdown applies where the format
supports it (Parquet/ORC row-group stats; JSON/CSV get column pruning
only). One unified entry point keeps pipeline code format-agnostic:

    read_any(spark, path)          # extension-sniffing reader
    write_any(df, path, "orc")     # format-keyed writer

Scale: prefer Parquet/ORC for anything hot — JSONL/CSV scans re-parse
text per query and cannot skip row groups. ``compact`` rewrites a
small-files directory into ``target_files`` larger files (the
HDFS/S3 small-files fix) with one shuffle-free coalesce when shrinking.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT = {
    ".parquet": "parquet", ".orc": "orc", ".jsonl": "json", ".json": "json",
    ".ndjson": "json", ".csv": "csv", ".avro": "avro", ".txt": "text",
}


def sniff_format(path: str) -> str:
    """Format from the file/dir extension; directories of part-files
    sniff from any part file inside."""
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lower()
    if not ext and os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            if name.startswith(("part-", "data")) and "." in name:
                ext = "." + name.split(".")[-1].lower()
                break
    if ext in _EXT:
        return _EXT[ext]
    raise ValueError(f"cannot sniff format of {path!r} (ext {ext!r})")


def read_any(spark: SparkSession, path: str, fmt: str | None = None,
             schema: str | None = None, **options) -> DataFrame:
    """Distributed read of any supported format. CSV defaults to
    header+inferSchema unless a ``schema`` string is given (prefer the
    explicit schema in pipelines — inference scans the data twice)."""
    fmt = fmt or sniff_format(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if fmt == "json":
        # JSONL is the default Spark JSON layout (one object per line)
        options.setdefault("multiLine", "false")
    return reader.options(**options).format(fmt).load(path)


def write_any(df: DataFrame, path: str, fmt: str | None = None,
              mode: str = "overwrite", partition_by: list[str] | None = None,
              **options) -> None:
    fmt = fmt or sniff_format(path)
    writer = df.write.mode(mode).options(**options)
    if fmt == "csv":
        options.setdefault("header", "true")
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is an external package; probe the classpath instead
    of failing mid-write."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat")
        return True
    except Exception:
        return False


def compact(spark: SparkSession, path: str, target_files: int,
            fmt: str | None = None) -> None:
    """Rewrite a directory into ``target_files`` files (small-files
    compaction). Uses coalesce — a shuffle-free narrowing — because
    compaction only ever reduces file count.

    LOCAL-FILESYSTEM ONLY: the swap relies on ``os.rename``, which has
    no HDFS/S3 equivalent (object stores need a committer or a table
    format like Delta/Iceberg for atomic replace). The compacted copy
    is row-count-verified BEFORE the original is touched, and the
    backup directory is only deleted after the swapped-in copy
    verifies too, so a crash at any step leaves at least one complete
    copy on disk (possibly under ``.compact.bak``, which a retry will
    clear)."""
    import shutil

    p = path.rstrip("/")
    fmt = fmt or sniff_format(path)
    df = read_any(spark, path, fmt)
    expected = df.count()
    tmp = p + ".compact.tmp"
    bak = p + ".compact.bak"
    shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(tmp)
    got = read_any(spark, tmp, fmt).count()
    if got != expected:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact verification failed: {got} rows != {expected}")
    os.rename(p, bak)
    os.rename(tmp, p)
    if read_any(spark, p, fmt).count() == expected:
        shutil.rmtree(bak, ignore_errors=True)
