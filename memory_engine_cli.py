#!/usr/bin/env python
"""memory-engine-spark CLI — query / search / export / analytics parity
with the reference CLI (/root/reference/memory_engine_cli.py:894-949
`query build/execute`, README.md:205-213 `events replay`, export/import
commands).

Usage examples:
  python memory_engine_cli.py --tables /root/testdata/sf0.001 \\
      query --entity orders --filter o_orderstatus eq O --limit 5
  python memory_engine_cli.py --tables DIR search --text "spark join" \\
      --entity documents --text-col text
  python memory_engine_cli.py --tables DIR export --entity region --fmt json --out /tmp/r
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="memory-engine-spark")
    p.add_argument("--tables", required=True, help="directory of <name>.parquet tables")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="structured QuerySpec query")
    q.add_argument("--entity", required=True)
    q.add_argument("--filter", nargs=3, action="append", default=[],
                   metavar=("FIELD", "OP", "VALUE"))
    q.add_argument("--sort", nargs=2, action="append", default=[],
                   metavar=("FIELD", "ASC|DESC"))
    q.add_argument("--limit", type=int)
    q.add_argument("--offset", type=int, default=0)
    q.add_argument("--select", nargs="+")

    s = sub.add_parser("search", help="ranked text search")
    s.add_argument("--text", required=True)
    s.add_argument("--entity", default="nodes")
    s.add_argument("--text-col", default="content")
    s.add_argument("--limit", type=int, default=10)

    n = sub.add_parser("nlq", help="natural-language query")
    n.add_argument("--question", required=True)
    n.add_argument("--entity", default="nodes")

    e = sub.add_parser("export", help="export a table")
    e.add_argument("--entity", required=True)
    e.add_argument("--fmt", choices=["json", "csv"], default="json")
    e.add_argument("--out", required=True)

    r = sub.add_parser("replay", help="replay events from a timestamp")
    r.add_argument("--events-dir", required=True)
    r.add_argument("--from-timestamp", required=True)

    d = sub.add_parser("dedup", help="near-duplicate report for a text table")
    d.add_argument("--entity", default="documents")
    d.add_argument("--text-col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--method", choices=["exact", "jaccard", "minhash"],
                   default="minhash")
    d.add_argument("--threshold", type=float, default=0.7)

    g = sub.add_parser("corpus-filter",
                       help="Gopher quality gate + repetition report")
    g.add_argument("--entity", default="documents")
    g.add_argument("--text-col", default="text")
    g.add_argument("--id-col", default="doc_id")
    g.add_argument("--limit", type=int, default=20)

    se = sub.add_parser("sessionize", help="gap-based sessions over events")
    se.add_argument("--entity", default="events")
    se.add_argument("--key-col", default="user_id")
    se.add_argument("--ts-col", default="ts")
    se.add_argument("--gap-s", type=float, default=1800.0)
    se.add_argument("--limit", type=int, default=20)

    b = sub.add_parser("backup", help="back up tables to a directory")
    b.add_argument("--out", required=True)
    b.add_argument("--entities", nargs="+", required=True)
    return p


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from memory_engine_spark.engine import MemoryEngine
    from memory_engine_spark.plans.query_spec import QuerySpec
    from memory_engine_spark.session import EngineSession, get_spark

    spark = get_spark("memory-engine-cli")
    spark.sparkContext.setLogLevel("ERROR")
    session = EngineSession(spark)
    session.attach_dir(args.tables)
    engine = MemoryEngine(session)

    if args.cmd == "query":
        spec = QuerySpec(args.entity)
        for fld, op, val in args.filter:
            spec.filter(fld, op, _coerce(val))
        for fld, direction in args.sort:
            spec.sort(fld, direction.upper() != "DESC")
        spec.page(args.offset, args.limit)
        if args.select:
            spec.select(*args.select)
        resp = engine.query(spec, use_cache=False)
        print(json.dumps({"total": resp.total_count, "results": resp.results},
                         default=str, indent=2))
    elif args.cmd == "search":
        resp = engine.search(args.text, entity=args.entity,
                             text_col=args.text_col, limit=args.limit)
        print(json.dumps({"total": resp.total_count, "results": resp.results},
                         default=str, indent=2))
    elif args.cmd == "nlq":
        from memory_engine_spark.plans.nlq import parse_nl_query
        parsed = parse_nl_query(args.question, args.entity)
        if parsed.search_terms and parsed.intent in ("text_search", "semantic_search"):
            resp = engine.search(parsed.search_terms, entity=args.entity)
        else:
            resp = engine.query(parsed.spec, use_cache=False)
        print(json.dumps({"intent": parsed.intent, "terms": parsed.search_terms,
                          "total": resp.total_count, "results": resp.results},
                         default=str, indent=2))
    elif args.cmd == "export":
        from memory_engine_spark.sources import export as ex
        df = session.table(args.entity)
        (ex.export_json if args.fmt == "json" else ex.export_csv)(df, args.out)
        print(json.dumps({"exported": args.entity, "to": args.out,
                          "rows": df.count()}))
    elif args.cmd == "replay":
        from memory_engine_spark.streaming.events import EventBus
        bus = EventBus(spark, args.events_dir)
        n = bus.replay(args.from_timestamp).count()
        print(json.dumps({"replayed": n, "from": args.from_timestamp}))
    elif args.cmd == "dedup":
        from memory_engine_spark.operators import dedup
        df = session.table(args.entity)
        if args.method == "exact":
            out = dedup.exact_duplicate_groups(df, args.text_col, args.id_col)
        elif args.method == "jaccard":
            out = dedup.ngram_jaccard_pairs(df, args.text_col, args.id_col,
                                            threshold=args.threshold)
        else:
            out = dedup.minhash_md5_neardup(df, args.text_col, args.id_col,
                                            threshold=args.threshold)
        rows = [r.asDict() for r in out.limit(100).collect()]
        print(json.dumps({"method": args.method, "n_reported": len(rows),
                          "results": rows}, default=str, indent=2))
    elif args.cmd == "corpus-filter":
        from pyspark.sql import functions as F

        from memory_engine_spark.operators import text as textops
        df = session.table(args.entity)
        gate = textops.gopher_filter(df, args.text_col, args.id_col)
        dropped = gate.filter(~F.col("keep"))
        rows = [r.asDict() for r in dropped.limit(args.limit).collect()]
        print(json.dumps({
            "n_docs": df.count(), "n_dropped": dropped.count(),
            "sample_dropped": rows}, default=str, indent=2))
    elif args.cmd == "sessionize":
        from pyspark.sql import functions as F

        from memory_engine_spark.operators import temporal
        df = session.table(args.entity)
        # TIMESTAMP(NANOS) parquet reads as bigint nanos under the
        # legacy flag — normalize to a real timestamp
        if dict(df.dtypes).get(args.ts_col) == "bigint":
            df = df.withColumn(args.ts_col, F.timestamp_micros(
                (F.col(args.ts_col) / 1000).cast("long")))
        stats = temporal.session_stats(
            temporal.sessionize(df, args.key_col, args.ts_col, args.gap_s),
            args.key_col, args.ts_col)
        rows = [r.asDict() for r in
                stats.orderBy(F.col("n_events").desc(), "session_id")
                .limit(args.limit).collect()]
        print(json.dumps({"n_sessions": stats.count(), "top": rows},
                         default=str, indent=2))
    elif args.cmd == "backup":
        from memory_engine_spark.sources.backup import BackupManager
        bm = BackupManager(spark, args.out)
        manifest = bm.create_backup(
            {e: session.table(e) for e in args.entities})
        print(json.dumps({"backup_id": manifest["backup_id"],
                          "tables": {k: v["rows"] for k, v in
                                     manifest["tables"].items()}}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
