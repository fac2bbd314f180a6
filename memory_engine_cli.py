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
    return 0


if __name__ == "__main__":
    sys.exit(main())
