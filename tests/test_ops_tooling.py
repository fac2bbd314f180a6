"""Ops tooling: backup/restore, async task queue, module registry
(reference backup_manager.py, async_queue_processor.py,
module_registry.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.plugins import ModuleMetadata, ModuleRegistry, Version
from memory_engine_spark.sources.backup import BackupManager, table_checksum
from memory_engine_spark.streaming.task_queue import TaskQueue


# -- backup / restore ---------------------------------------------------------

def test_backup_full_roundtrip_and_verify(spark, tmp_path):
    bm = BackupManager(spark, str(tmp_path / "bk"))
    nodes = spark.createDataFrame([("a", 1), ("b", 2)], "node_id string, v int")
    edges = spark.createDataFrame([("a", "b", "r")],
                                  "from_id string, to_id string, relation_type string")
    m = bm.create_backup({"nodes": nodes, "edges": edges}, backup_id="b1")
    assert m["tables"]["nodes"]["rows"] == 2
    assert bm.verify_backup("b1")
    back = bm.restore_backup("b1")
    assert back["nodes"].exceptAll(nodes).isEmpty()
    assert back["edges"].count() == 1
    assert [b["backup_id"] for b in bm.list_backups()] == ["b1"]


def test_backup_incremental_overlay(spark, tmp_path):
    bm = BackupManager(spark, str(tmp_path / "bk2"))
    v1 = spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    bm.create_backup({"t": v1}, backup_id="full1")
    v2 = spark.createDataFrame([("a", 1), ("b", 20), ("c", 3)], "id string, v int")
    m = bm.create_backup({"t": v2}, backup_id="inc1", strategy="incremental",
                         base_backup_id="full1", key_cols={"t": "id"})
    # only the changed/new rows are stored
    assert m["tables"]["t"]["rows"] == 2
    restored = {r["id"]: r["v"] for r in bm.restore_backup("inc1")["t"].collect()}
    assert restored == {"a": 1, "b": 20, "c": 3}


def test_backup_checksum_detects_tamper(spark, tmp_path):
    bm = BackupManager(spark, str(tmp_path / "bk3"), verify=False)
    df = spark.createDataFrame([("x", 5)], "id string, v int")
    bm.create_backup({"t": df}, backup_id="b")
    # tamper: swap the manifest checksum
    mpath = tmp_path / "bk3" / "b" / "manifest.json"
    m = json.loads(mpath.read_text())
    m["tables"]["t"]["checksum"] += 1
    mpath.write_text(json.dumps(m))
    with pytest.raises(ValueError, match="failed verification"):
        bm.verify_backup("b")


def test_backup_retention_keeps_chained_base(spark, tmp_path):
    bm = BackupManager(spark, str(tmp_path / "bk4"), retention_days=1)
    df = spark.createDataFrame([("x", 1)], "id string, v int")
    bm.create_backup({"t": df}, backup_id="old_full")
    # age the full backup past retention
    idx = json.loads((tmp_path / "bk4" / "index.json").read_text())
    idx["old_full"]["timestamp"] -= 10 * 86400
    (tmp_path / "bk4" / "index.json").write_text(json.dumps(idx))
    bm.create_backup({"t": df}, backup_id="inc", strategy="incremental",
                     base_backup_id="old_full", key_cols={"t": "id"})
    ids = {b["backup_id"] for b in bm.list_backups()}
    assert "old_full" in ids  # still a chain base — never dropped


def test_table_checksum_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id int, s string")
    c = spark.createDataFrame([(1, "x"), (2, "z")], "id int, s string")
    assert table_checksum(a) == table_checksum(b)
    assert table_checksum(a) != table_checksum(c)


# -- task queue ---------------------------------------------------------------

def test_task_queue_priority_retry_and_metrics(spark, tmp_path):
    q = TaskQueue(spark, str(tmp_path / "q"))
    low = q.submit("echo", {"x": 1}, priority="low")
    hi = q.submit("echo", {"x": 2}, priority="critical")
    boom = q.submit("boom", {"x": 3}, priority="high", max_retries=2)

    def echo(batch):
        return batch.select("task_id",
                            F.col("payload").alias("result"),
                            F.lit(None).cast("string").alias("error"))

    def always_fail(batch):
        return batch.select("task_id",
                            F.lit(None).cast("string").alias("result"),
                            F.lit("nope").alias("error"))

    q.register_processor("echo", echo)
    q.register_processor("boom", always_fail)

    # claim order: critical first, then high, then low
    claimed = q.claim(batch_size=2)
    ids = [r["task_id"] for r in claimed.orderBy(F.col("priority").desc()).collect()]
    assert ids == [hi, boom]
    # reset by re-creating the queue state: claimed tasks are processing
    st = {r["task_id"]: r["status"] for r in q.current_state().collect()}
    assert st[hi] == "processing" and st[low] == "pending"

    q2 = TaskQueue(spark, str(tmp_path / "q2"))
    q2.register_processor("echo", echo)
    q2.register_processor("boom", always_fail)
    t_ok = q2.submit("echo", {"v": 9})
    t_bad = q2.submit("boom", {}, max_retries=1)
    counts = q2.process_available()
    assert counts["completed"] == 1 and counts["retrying"] == 1
    counts = q2.process_available()        # retry exhausts max_retries=1
    assert counts["failed"] == 1
    state = {r["task_id"]: r for r in q2.current_state().collect()}
    assert state[t_ok]["status"] == "completed"
    assert json.loads(state[t_ok]["result"]) == {"v": 9}
    assert state[t_bad]["status"] == "failed" and state[t_bad]["error"] == "nope"
    m = q2.metrics()
    assert m["n_completed"] == 1 and m["n_failed"] == 1
    assert m["avg_attempts_to_complete"] == 1.0


def test_task_queue_submit_batch(spark, tmp_path):
    """One log append for N tasks; FIFO-within-priority stays total
    even when submitted in the same clock tick."""
    q = TaskQueue(spark, str(tmp_path / "qb"))
    ids = q.submit_batch(
        [("echo", {"i": i}, "normal") for i in range(5)]
        + [("echo", {"i": 99}, "critical")])
    assert len(ids) == 6 and len(set(ids)) == 6
    st = q.current_state()
    assert st.count() == 6
    assert st.filter(F.col("status") == "pending").count() == 6
    claimed = q.claim(batch_size=3)
    rows = claimed.orderBy(F.col("priority").desc()).collect()
    # critical first, then the first two normals in submission order
    # (the per-task submitted_at offset makes same-tick FIFO total)
    assert rows[0]["task_id"] == ids[5]
    assert {r["task_id"] for r in rows[1:]} == {ids[0], ids[1]}


def test_task_queue_expiry_and_unroutable(spark, tmp_path):
    q = TaskQueue(spark, str(tmp_path / "qe"))
    t = q.submit("echo", {}, ttl_s=-1)          # already expired
    u = q.submit("mystery", {})
    state = {r["task_id"]: r["status"] for r in q.current_state().collect()}
    assert state[t] == "expired"
    counts = q.process_available()
    assert counts["unroutable"] == 1
    state = {r["task_id"]: r["status"] for r in q.current_state().collect()}
    assert state[u] == "failed"


# -- module registry ----------------------------------------------------------

def test_version_parse_and_compat():
    assert Version.parse("2.3.1").as_tuple() == (2, 3, 1)
    assert Version.parse("2.3").patch == 0
    assert Version.parse("1.4.0-rc1").as_tuple() == (1, 4, 0)
    assert Version.parse("1.5.0").is_compatible(Version.parse("1.2.0"))
    assert not Version.parse("2.0.0").is_compatible(Version.parse("1.2.0"))
    assert not Version.parse("1.1.0").is_compatible(Version.parse("1.2.0"))


def test_module_registry_resolution_and_lifecycle():
    reg = ModuleRegistry()
    reg.register(ModuleMetadata("storage", "1.2.0", capabilities=["store"]))
    reg.register(ModuleMetadata("embeddings", "1.0.0", capabilities=["embed"],
                                requires={"store": "1.0.0"}))
    reg.register(ModuleMetadata("search", "0.9.0",
                                requires={"embed": "1.0.0", "store": "1.1.0"}))
    order = reg.resolve_order()
    assert order.index("storage") < order.index("embeddings") < order.index("search")
    assert reg.find_providers("store", "1.0.0") == ["storage"]
    assert reg.find_providers("store", "2.0.0") == []

    statuses = reg.start_all()
    assert all(s == "active" for s in statuses.values())

    # failing initializer → error; dependents skipped (stay registered)
    reg2 = ModuleRegistry()
    reg2.register(ModuleMetadata("base", "1.0.0", capabilities=["cap"]))
    reg2.register(ModuleMetadata("child", "1.0.0", requires={"cap": "1.0.0"}))
    out = reg2.start_all({"base": lambda: 1 / 0})
    assert out == {"base": "error", "child": "registered"}


def test_module_registry_errors():
    reg = ModuleRegistry()
    reg.register(ModuleMetadata("a", "1.0.0", requires={"ghost": "1.0.0"}))
    with pytest.raises(ValueError, match="no compatible provider"):
        reg.resolve_order()
    reg2 = ModuleRegistry()
    reg2.register(ModuleMetadata("x", "1.0.0", capabilities=["cx"],
                                 requires={"cy": "1.0.0"}))
    reg2.register(ModuleMetadata("y", "1.0.0", capabilities=["cy"],
                                 requires={"cx": "1.0.0"}))
    with pytest.raises(ValueError, match="cycle"):
        reg2.resolve_order()
    with pytest.raises(ValueError, match="already registered"):
        reg2.register(ModuleMetadata("x", "2.0.0"))


def test_backup_incremental_requires_key_for_every_table(spark, tmp_path):
    bm = BackupManager(spark, str(tmp_path / "bk5"))
    t = spark.createDataFrame([("a", 1)], "id string, v int")
    bm.create_backup({"t": t, "u": t}, backup_id="full")
    with pytest.raises(ValueError, match="missing: \\['u'\\]"):
        bm.create_backup({"t": t, "u": t}, strategy="incremental",
                         base_backup_id="full", key_cols={"t": "id"})


def test_task_queue_ttl_zero_expires(spark, tmp_path):
    q = TaskQueue(spark, str(tmp_path / "qz"))
    t = q.submit("echo", {}, ttl_s=0.0)
    state = {r["task_id"]: r["status"] for r in q.current_state().collect()}
    assert state[t] == "expired"


def test_module_registry_unstarted_provider_not_satisfying():
    """A dependent must NOT activate just because an alternative
    provider exists that hasn't initialized yet (and certainly not when
    its ordered provider failed)."""
    reg = ModuleRegistry()
    reg.register(ModuleMetadata("p1", "1.0.0", capabilities=["cap"]))
    reg.register(ModuleMetadata("app", "1.0.0", requires={"cap": "1.0.0"}))
    reg.register(ModuleMetadata("p2", "1.0.0", capabilities=["cap"]))
    out = reg.start_all({"p1": lambda: 1 / 0})
    assert out["p1"] == "error"
    assert out["app"] == "registered"   # p2 was not active when app ran
    assert out["p2"] == "active"


def test_pin_registry_budget_and_rebuild(spark):
    """Round-6 session-cache discipline: every named resident index
    registers its RDD ids + byte sizes, LRU eviction enforces a budget,
    and an evicted cache transparently rebuilds on next touch (from its
    .derived parquet) instead of silently losing storage forever."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    em._edges(spark, sf)
    em._sym_adj(spark, sf)
    sizes = em.pinned_cache_sizes(spark)
    assert "edges" in sizes and "sym_adj" in sizes
    assert sizes["edges"] > 0 and sizes["sym_adj"] > 0

    # budget 1 byte -> everything non-protected LRU-evicts, oldest first
    evicted = em.evict_pins_to_budget(spark, budget=1)
    assert "edges" in evicted and "sym_adj" in evicted
    assert evicted.index("edges") < evicted.index("sym_adj")  # LRU order
    assert sum(em.pinned_cache_sizes(spark).values()) <= 1

    # evicted entry rebuilds on touch and re-registers with real bytes
    df = em._edges(spark, sf)
    assert df.count() > 0
    assert em.pinned_cache_sizes(spark)["edges"] > 0

    # automatic enforcement at registration time honors the env budget
    import os
    os.environ["SPARK_GRAFT_PIN_BUDGET_MB"] = "0"
    try:
        em._sym_adj(spark, sf)  # registering this must evict "edges"
        s = em.pinned_cache_sizes(spark)
        assert "edges" not in s  # LRU victim
    finally:
        del os.environ["SPARK_GRAFT_PIN_BUDGET_MB"]
    em.drop_all_pins(spark)


def test_delta_log_snapshot_replay(spark):
    """Last-action-wins liveness on a hand-built log: add->remove is
    gone, add->remove->re-add comes back WITH the re-add's stats,
    same-version ordering falls back to seq, and the JSON-in-JSON
    stats string parses through two get_json_object hops."""
    import json

    from memory_engine_spark.sources.formats import delta_log_snapshot

    def add(path, part, size, nrec, lo, hi):
        return json.dumps({"add": {
            "path": path, "partitionValues": {"part": str(part)},
            "size": size, "dataChange": True,
            "stats": json.dumps({"numRecords": nrec,
                                 "minValues": {"id": lo},
                                 "maxValues": {"id": hi}})}})

    def rm(path):
        return json.dumps({"remove": {"path": path,
                                      "dataChange": True}})

    rows = [
        (0, 0, add("a.parquet", 0, 100, 10, 0, 9)),
        (0, 1, add("b.parquet", 1, 200, 20, 10, 29)),
        (1, 0, rm("a.parquet")),                      # a: gone
        (2, 0, rm("b.parquet")),
        (3, 0, add("b.parquet", 1, 222, 22, 10, 31)),  # b: back
        # same-version seq ordering: add then remove in one commit
        (4, 0, add("c.parquet", 0, 300, 30, 40, 69)),
        (4, 1, rm("c.parquet")),                      # c: gone
    ]
    log = spark.createDataFrame(rows, "version int, seq long, "
                                      "line string")
    live = {r["path"]: r for r in delta_log_snapshot(log).collect()}
    assert set(live) == {"b.parquet"}
    b = live["b.parquet"]
    assert (b["part"], b["version"], b["size"], b["num_records"],
            b["min_id"], b["max_id"]) == (1, 3, 222, 22, 10, 31)


def test_orc_footer_meta_multi_stripe(spark, tmp_path):
    """Hand-rolled ORC protobuf walk vs Spark's own writer: a forced
    multi-stripe zlib file (tiny orc.stripe.size) must yield >1
    stripe whose row counts sum to the total; the NONE-compression
    path and the bad-magic guard are pinned too."""
    import glob

    import pytest

    from memory_engine_spark.sources.formats import orc_footer_meta

    df = spark.range(50000).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS s", "id * 1.5 AS v")
    d1 = str(tmp_path / "multi")
    (df.coalesce(1).write.format("orc")
     .option("compression", "zlib")
     .option("orc.stripe.size", 65536)
     .option("orc.rows.between.memory.checks", 512)
     .mode("overwrite").save(d1))
    m = orc_footer_meta(open(glob.glob(d1 + "/*.orc")[0], "rb").read())
    assert m["num_rows"] == 50000
    assert m["n_top_columns"] == 3
    assert m["compression"] == "zlib"
    assert len(m["stripes"]) > 1
    assert sum(s["num_rows"] for s in m["stripes"]) == 50000
    assert all(s["data_length"] > 0 for s in m["stripes"])

    d2 = str(tmp_path / "plain")
    (df.limit(100).coalesce(1).write.format("orc")
     .option("compression", "none").mode("overwrite").save(d2))
    m2 = orc_footer_meta(open(glob.glob(d2 + "/*.orc")[0],
                              "rb").read())
    assert m2["num_rows"] == 100 and m2["compression"] == "none"

    with pytest.raises(ValueError, match="magic"):
        orc_footer_meta(b"\x00" * 64 + b"\x10")


def test_snappy_decompress_cross_validated():
    """Pure-Python snappy vs pyarrow's C++ compressor on adversarial
    inputs: overlapping copies (RLE idiom), long literals (multi-byte
    length escape), incompressible bytes, empty input."""
    import pyarrow as pa

    from memory_engine_spark.sources.formats import _snappy_decompress

    cases = [
        b"",
        b"a",
        b"ab" * 40000,                       # overlapping copy, off=2
        bytes(range(256)) * 300,             # mixed
        b"\x00" * 100000,                    # off=1 overlap run
        ("the quick brown fox " * 1000).encode(),
        bytes((i * 7 + 13) % 251 for i in range(70000)),  # literal-y
    ]
    for raw in cases:
        comp = pa.compress(raw, codec="snappy", asbytes=True)
        assert _snappy_decompress(comp) == raw


def test_parquet_int64_decode_nulls_and_plain(spark, tmp_path):
    """Hand-rolled parquet column read vs Spark's writer: a nullable
    INT64 column (def-level RLE path) and a high-cardinality column
    that overflows the dictionary into PLAIN fallback pages; both
    must reproduce values exactly, nulls placed correctly."""
    import glob

    from memory_engine_spark.sources.formats import (
        parquet_read_int64_column)

    df = spark.range(200000).selectExpr(
        "id AS k",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id % 50 END AS small",
        "id * 1000003 AS wide")  # 200k distinct -> dict overflow
    d = str(tmp_path / "pq")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    payload = open(glob.glob(d + "/*.parquet")[0], "rb").read()

    small = parquet_read_int64_column(payload, "small")
    assert len(small) == 200000
    assert all((v is None) == (i % 7 == 0)
               for i, v in enumerate(small))
    assert all(v == i % 50 for i, v in enumerate(small)
               if v is not None)

    wide = parquet_read_int64_column(payload, "wide")
    assert wide == [i * 1000003 for i in range(200000)]


def test_parquet_string_decode_nulls_dict_and_plain(spark, tmp_path):
    """BYTE_ARRAY twin of the INT64 Spark-writer test (r14, q244's
    machinery): a nullable low-cardinality string column (dictionary
    pages + def-level RLE) and a high-cardinality column that
    overflows the dictionary into PLAIN-framed fallback pages — both
    reproduced exactly, nulls placed correctly, multi-byte UTF-8
    intact; the ranged file reader byte-identical and cheaper than
    half the file on a multi-column layout."""
    import glob
    import os

    from memory_engine_spark.sources.formats import (
        parquet_read_string_column, parquet_read_string_column_file)

    df = spark.range(120000).selectExpr(
        "id AS k",
        "CASE WHEN id % 7 = 0 THEN NULL "
        "ELSE concat('vé', id % 40) END AS s",
        "concat('u-', id) AS wide")   # 120k distinct -> dict overflow
    d = str(tmp_path / "pqs")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    p = glob.glob(d + "/*.parquet")[0]
    payload = open(p, "rb").read()

    s = parquet_read_string_column(payload, "s")
    assert len(s) == 120000
    assert all((v is None) == (i % 7 == 0) for i, v in enumerate(s))
    assert all(v == f"vé{i % 40}" for i, v in enumerate(s)
               if v is not None)
    wide = parquet_read_string_column(payload, "wide")
    assert wide == [f"u-{i}" for i in range(120000)]

    # ranged reader: identical values, bytes < half the file
    size = os.path.getsize(p)
    cf = _CountingFile(p, "rb")
    assert parquet_read_string_column_file(
        p, "s", open_fn=lambda pa, m: cf) == s
    assert cf.bytes_read < size * 0.5, (cf.bytes_read, size)

    # wrong-physical-type guard is loud
    import pytest as _pytest
    with _pytest.raises(ValueError, match="BYTE_ARRAY"):
        parquet_read_string_column(payload, "k")


def test_parquet_v2_uncompressed_page_under_snappy_codec():
    """DataPageHeaderV2.is_compressed is field 7 of the v2 header
    struct, NOT field 7 of the enclosing PageHeader (that slot is
    dictionary_page_header) — r13 ADVICE pin. A v2 page stored raw
    (is_compressed=false) inside a SNAPPY-codec chunk must be read
    as-is; a compressed sibling still inflates. Hand-assembled
    thrift-compact bytes so both flag states are exercised
    (pyarrow/Spark never emit the raw-under-codec shape)."""
    import struct

    from memory_engine_spark.sources.formats import (
        _pq_decode_int64_chunk)

    def varint(v):
        out = bytearray()
        while True:
            x = v & 0x7F
            v >>= 7
            if v:
                out.append(x | 0x80)
            else:
                out.append(x)
                return bytes(out)

    def zig(v):
        return varint((v << 1) ^ (v >> 63))

    def tc_struct(fields):
        out, last = bytearray(), 0
        for fid, typ, val in fields:
            delta = fid - last
            assert 0 < delta <= 15
            last = fid
            if typ == "i32":
                out.append((delta << 4) | 5)
                out += zig(val)
            elif typ == "bool":
                out.append((delta << 4) | (1 if val else 2))
            else:                           # nested struct
                out.append((delta << 4) | 12)
                out += val
        out.append(0)
        return bytes(out)

    def snappy_literal(data):
        out = bytearray(varint(len(data)))
        for i in range(0, len(data), 60):
            chunk = data[i:i + 60]
            out.append((len(chunk) - 1) << 2)
            out += chunk
        return bytes(out)

    vals = list(range(-3, 4))
    body = struct.pack(f"<{len(vals)}q", *vals)

    def page(is_comp, raw_body):
        v2 = tc_struct([
            (1, "i32", len(vals)), (2, "i32", 0), (3, "i32", len(vals)),
            (4, "i32", 0),                  # PLAIN
            (5, "i32", 0), (6, "i32", 0),   # no def/rep level bytes
            (7, "bool", is_comp)])
        ph = tc_struct([
            (1, "i32", 3),                  # DATA_PAGE_V2
            (2, "i32", len(body)),
            (3, "i32", len(raw_body)),
            (8, "struct", v2)])
        return ph + raw_body

    cm = {4: 1, 5: len(vals)}               # codec = SNAPPY

    assert _pq_decode_int64_chunk(page(False, body), cm, False) == vals
    assert _pq_decode_int64_chunk(
        page(True, snappy_literal(body)), cm, False) == vals


def test_parquet_v2_negative_body_claim_is_loud_not_unbounded():
    """r15 pin: a corrupt v2 header whose uncompressed_page_size is
    SMALLER than rep+def level lengths implies a negative body size;
    passing that to the gzip inflater as max_length would hit zlib's
    max_length=0 == UNLIMITED semantics (the allocation cap silently
    off). The chunk walk must reject the header shape loudly before
    any inflate. Levels count toward both sizes per parquet-format,
    so no valid writer emits this."""
    import gzip as _gz
    import struct

    import pytest as _pytest

    from memory_engine_spark.sources.formats import (
        _pq_decode_int64_chunk)

    def varint(v):
        out = bytearray()
        while True:
            x = v & 0x7F
            v >>= 7
            if v:
                out.append(x | 0x80)
            else:
                out.append(x)
                return bytes(out)

    def zig(v):
        return varint((v << 1) ^ (v >> 63))

    def tc_struct(fields):
        out, last = bytearray(), 0
        for fid, typ, val in fields:
            delta = fid - last
            assert 0 < delta <= 15
            last = fid
            if typ == "i32":
                out.append((delta << 4) | 5)
                out += zig(val)
            elif typ == "bool":
                out.append((delta << 4) | (1 if val else 2))
            else:
                out.append((delta << 4) | 12)
                out += val
        out.append(0)
        return bytes(out)

    vals = list(range(-3, 4))
    body = struct.pack(f"<{len(vals)}q", *vals)
    comp = _gz.compress(body, mtime=0)

    def page(usize, rlen, dlen, raw):
        v2 = tc_struct([
            (1, "i32", len(vals)), (2, "i32", 0), (3, "i32", len(vals)),
            (4, "i32", 0),                  # PLAIN
            (5, "i32", dlen), (6, "i32", rlen),
            (7, "bool", True)])
        ph = tc_struct([
            (1, "i32", 3),                  # DATA_PAGE_V2
            (2, "i32", usize),
            (3, "i32", len(raw)),
            (8, "struct", v2)])
        return ph + raw

    cm = {4: 2, 5: len(vals)}               # codec = GZIP

    # sane header decodes through the gzip path
    assert _pq_decode_int64_chunk(
        page(len(body), 0, 0, comp), cm, False) == vals
    # usize < rlen+dlen (negative body claim) is a loud reject
    with _pytest.raises(ValueError, match="v2 level"):
        _pq_decode_int64_chunk(
            page(3, 2, 2, b"\x00" * 4 + comp), cm, False)


class _CountingFile:
    """open_fn seam for the *_file readers: counts bytes actually
    read so tests can pin the tail-range I/O budget."""

    def __init__(self, path, mode):
        self.f = open(path, mode)
        self.bytes_read = 0

    def seek(self, *a):
        return self.f.seek(*a)

    def tell(self):
        return self.f.tell()

    def read(self, n=-1):
        d = self.f.read(n)
        self.bytes_read += len(d)
        return d

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.f.close()


def test_footer_probes_read_only_tail_ranges(spark, tmp_path):
    """r12 verdict weak-pair fix, pinned: the q184/q189/q190 probes'
    file readers touch ≤ head-magic + min(size, tail_hint) bytes for
    footer metadata (one exact retry when the footer exceeds the
    hint), and footer + the TARGET column's chunks for a column
    read — never the whole file — while staying byte-identical to
    the whole-bytes parsers."""
    import glob
    import os

    from memory_engine_spark.sources.formats import (
        orc_footer_meta, orc_footer_meta_file, parquet_footer_meta,
        parquet_footer_meta_file, parquet_read_int64_column,
        parquet_read_int64_column_file)

    # parquet footer: every testdata table, default + tiny hint
    for p in sorted(glob.glob("/root/testdata/sf0.001/*.parquet")):
        size = os.path.getsize(p)
        full = parquet_footer_meta(open(p, "rb").read())
        cf = _CountingFile(p, "rb")
        assert parquet_footer_meta_file(
            p, open_fn=lambda pa, m: cf) == full
        assert cf.bytes_read <= 4 + min(size, 65536), p
        cf2 = _CountingFile(p, "rb")   # hint smaller than the footer
        assert parquet_footer_meta_file(
            p, tail_hint=64, open_fn=lambda pa, m: cf2) == full
        # head + 64-byte tail + one exact (footer_len + 8) retry
        assert cf2.bytes_read < size + 72, p

    # parquet column read: bytes = footer + target chunks only; on a
    # multi-column file that is strictly less than the file
    p = "/root/testdata/sf0.01/lineitem.parquet"
    size = os.path.getsize(p)
    full_vals = parquet_read_int64_column(open(p, "rb").read(),
                                          "l_orderkey")
    cf = _CountingFile(p, "rb")
    assert parquet_read_int64_column_file(
        p, "l_orderkey", open_fn=lambda pa, m: cf) == full_vals
    assert cf.bytes_read < size * 0.5, (cf.bytes_read, size)

    # ORC: postscript + footer from one tail slice; retry path exact
    df = spark.range(30000).selectExpr("id", "CAST(id AS STRING) s")
    d = str(tmp_path / "orc_tail")
    (df.coalesce(1).write.format("orc")
     .option("compression", "zlib").mode("overwrite").save(d))
    p = glob.glob(d + "/*.orc")[0]
    size = os.path.getsize(p)
    full = orc_footer_meta(open(p, "rb").read())
    cf = _CountingFile(p, "rb")
    assert orc_footer_meta_file(p, open_fn=lambda pa, m: cf) == full
    assert cf.bytes_read <= 3 + min(size, 65536)
    cf2 = _CountingFile(p, "rb")
    assert orc_footer_meta_file(
        p, tail_hint=64, open_fn=lambda pa, m: cf2) == full
    assert cf2.bytes_read < 3 + 256 + 1024  # head + tail + footer


def test_footer_retry_path_on_real_wide_file(spark, tmp_path):
    """The exact-retry seam under a REAL Spark file whose footer
    exceeds the default 64 KB hint (wide schema × many row groups —
    the shape a 100-TB table's metadata actually takes): the ranged
    reader must fire ONE retry of exactly footer_len + 8 bytes and
    agree with duckdb's parquet_file_metadata."""
    import glob
    import os

    import duckdb

    from memory_engine_spark.sources.formats import (
        parquet_footer_meta_file)
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        "id", *[(F.col("id") * (i + 3)).alias(f"c{i:03d}")
                for i in range(199)])
    d = str(tmp_path / "wide")
    (df.coalesce(1).write.mode("overwrite")
     .option("parquet.block.size", 65536).parquet(d))
    p = glob.glob(d + "/*.parquet")[0]
    size = os.path.getsize(p)
    raw_tail = open(p, "rb").read()[-8:-4]
    flen = int.from_bytes(raw_tail, "little")
    assert flen + 8 > 65536          # the retry MUST be exercised

    cf = _CountingFile(p, "rb")
    m = parquet_footer_meta_file(p, open_fn=lambda pa, mo: cf)
    # head magic + first tail slice + one exact footer slice
    assert cf.bytes_read == 4 + 65536 + flen + 8
    assert cf.bytes_read < size      # and still far from whole-file

    nr, ng = duckdb.connect().execute(
        "SELECT num_rows, num_row_groups "
        f"FROM parquet_file_metadata('{p}')").fetchone()
    assert m["num_rows"] == nr == 2000
    assert len(m["row_groups"]) == ng > 1
    assert m["n_top_columns"] == 200


def test_delta_log_snapshot_as_of_version(spark):
    """Time travel caps the LOG before the window (not the live set
    after): at v=0 both files exist; at v=2 'b' is gone (removed at
    1, re-added only at 3); at v=3 'b' is back with the NEW stats."""
    import json

    from memory_engine_spark.sources.formats import delta_log_snapshot

    def add(path, size):
        return json.dumps({"add": {
            "path": path, "partitionValues": {"part": "0"},
            "size": size, "dataChange": True,
            "stats": json.dumps({"numRecords": size // 10,
                                 "minValues": {"id": 0},
                                 "maxValues": {"id": 1}})}})

    rows = [
        (0, 0, add("a.parquet", 100)),
        (0, 1, add("b.parquet", 200)),
        (1, 0, json.dumps({"remove": {"path": "b.parquet",
                                      "dataChange": True}})),
        (3, 0, add("b.parquet", 300)),
    ]
    log = spark.createDataFrame(rows, "version int, seq long, "
                                      "line string")

    def paths(v):
        return {r["path"]: r for r in delta_log_snapshot(
            log, as_of_version=v).collect()}

    assert set(paths(0)) == {"a.parquet", "b.parquet"}
    assert set(paths(2)) == {"a.parquet"}
    at3 = paths(3)
    assert set(at3) == {"a.parquet", "b.parquet"}
    assert at3["b.parquet"]["size"] == 300


def test_schema_drift_union_semantics(spark):
    """Rename map applies per batch, missing columns get TYPED
    defaults, canonical layout is sorted and deterministic, and a
    missing column without a default raises."""
    import pytest

    from memory_engine_spark.sources.formats import schema_drift_union

    a = spark.createDataFrame([(1, "x")], "id long, text string")
    b = spark.createDataFrame([(2, "y", "en")],
                              "id long, body string, lang string")
    out = schema_drift_union(
        [a, b], renames={"body": "text"},
        defaults={"lang": ("string", "und")})
    assert out.columns == ["id", "lang", "text"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["lang"] == "und" and rows[1]["text"] == "x"
    assert rows[2]["lang"] == "en" and rows[2]["text"] == "y"
    with pytest.raises(ValueError, match="no default"):
        schema_drift_union([a, b], renames={"body": "text"})


# -- registry version guard ----------------------------------------------------

def test_oracle_check_version_guard():
    """REGISTRY.md pin (r10): the self-check harness must refuse to
    certify the byte-exact contract under a different Spark
    major.minor (exit 3 — distinct from a parity failure's exit 1)
    and must run-but-flag under --allow-version-drift."""
    import importlib.util

    import pytest as _pytest

    spec = importlib.util.spec_from_file_location(
        "oracle_check_mod", "/root/repo/tools/oracle_check.py")
    oc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oc)

    class Pinned:
        version = oc.PINNED_SPARK + ".2"

    class Drifted:
        version = "9.9.0"

    assert oc.check_version(Pinned, False) is False
    with _pytest.raises(SystemExit) as e:
        oc.check_version(Drifted, False)
    assert e.value.code == 3
    assert oc.check_version(Drifted, True) is True
