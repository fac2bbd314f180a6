"""Graph export/import: JSON, CSV, GraphML, Cypher, plus subgraph export.

Reference: /root/reference/memory_core/migration/data_exporter.py:19-683
(formats + writers), data_importer.py:42-553 (auto-detect + validate +
merge-duplicates), enhanced_mcp_endpoint.py:1104-1213 (subgraph export),
backend_migrator.py (copy + verify).

Spark-first: JSON/CSV are native distributed writers; GraphML and
Cypher are line-oriented text formats produced per-partition with
``mapPartitions``-style expression rendering (one string column →
``df.write.text``) — the document header/footer for GraphML is written
driver-side since it's O(1).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def import_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def export_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def import_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return reader.csv(path)


def _xml_escape(col):
    # Escaped values are emitted inside double-quoted XML attributes, so
    # '"' must map to &quot; as well.
    out = col.cast("string")
    for raw, esc in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;")):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """GraphML writer (data_exporter.py:244-330 shape): distributed body
    rendering, tiny driver-side header/footer assembly."""
    node_lines = nodes.select(
        F.concat(F.lit('    <node id="'), _xml_escape(F.col("node_id")),
                 F.lit('"/>')).alias("line"))
    edge_lines = edges.select(
        F.concat(F.lit('    <edge source="'), _xml_escape(F.col("from_id")),
                 F.lit('" target="'), _xml_escape(F.col("to_id")),
                 F.lit('" label="'), _xml_escape(F.col("relation_type")),
                 F.lit('"/>')).alias("line"))
    body_dir = path + ".body"
    node_lines.unionByName(edge_lines).coalesce(1).write.mode("overwrite").text(body_dir)
    part = next(f for f in os.listdir(body_dir) if f.startswith("part-"))
    with open(path, "w") as out:
        out.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                  '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
                  '  <graph id="G" edgedefault="directed">\n')
        with open(os.path.join(body_dir, part)) as src:
            # chunked copy: the body part can be arbitrarily large —
            # never materialize it in driver memory at once
            shutil.copyfileobj(src, out, 1 << 20)
        out.write("  </graph>\n</graphml>\n")


def export_cypher(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Cypher CREATE-script writer (data_exporter.py:331-414 shape)."""
    def q(col):
        return F.replace(col.cast("string"), F.lit("'"), F.lit("\\'"))

    node_lines = nodes.select(
        F.concat(F.lit("CREATE (:Node {node_id: '"), q(F.col("node_id")),
                 F.lit("'});")).alias("line"))
    edge_lines = edges.select(
        F.concat(F.lit("MATCH (a:Node {node_id: '"), q(F.col("from_id")),
                 F.lit("'}), (b:Node {node_id: '"), q(F.col("to_id")),
                 F.lit("'}) CREATE (a)-[:"),
                 F.regexp_replace(F.upper("relation_type"), "[^A-Z0-9_]", "_"),
                 F.lit("]->(b);")).alias("line"))
    node_lines.unionByName(edge_lines).write.mode("overwrite").text(path)


def export_gremlin(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Gremlin addV/addE statement writer (data_exporter.py:527-574
    shape): one statement per row rendered as a Column expression,
    distributed text write."""
    def q(col):
        return F.replace(col.cast("string"), F.lit("'"), F.lit("\\'"))

    node_lines = nodes.select(
        F.concat(F.lit("g.addV('Node').property(id, '"), q(F.col("node_id")),
                 F.lit("');")).alias("line"))
    edge_lines = edges.select(
        F.concat(F.lit("g.V('"), q(F.col("from_id")),
                 F.lit("').addE('"), q(F.col("relation_type")),
                 F.lit("').to(g.V('"), q(F.col("to_id")),
                 F.lit("'));")).alias("line"))
    node_lines.unionByName(edge_lines).write.mode("overwrite").text(path)


def export_rdf(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """RDF/Turtle triple writer (data_exporter.py:576-617 shape):
    kg:node_<id> rdf:type kg:Node triples plus one predicate triple per
    edge; body distributed, O(1) @prefix header driver-side."""
    def uri(col):
        return F.concat(F.lit("kg:node_"),
                        F.regexp_replace(col.cast("string"), r"[^A-Za-z0-9_]", "_"))

    def pred(col):
        return F.concat(F.lit("kg:"),
                        F.regexp_replace(col.cast("string"), r"[^A-Za-z0-9_]", "_"))

    node_lines = nodes.select(
        F.concat(uri(F.col("node_id")), F.lit(" rdf:type kg:Node .")).alias("line"))
    edge_lines = edges.select(
        F.concat(uri(F.col("from_id")), F.lit(" "), pred(F.col("relation_type")),
                 F.lit(" "), uri(F.col("to_id")), F.lit(" .")).alias("line"))
    body_dir = path + ".body"
    node_lines.unionByName(edge_lines).coalesce(1).write.mode("overwrite").text(body_dir)
    part = next(f for f in os.listdir(body_dir) if f.startswith("part-"))
    with open(path, "w") as out:
        out.write("@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
                  "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
                  "@prefix kg: <http://memory-engine.org/kg#> .\n\n")
        with open(os.path.join(body_dir, part)) as src:
            # chunked copy: the body part can be arbitrarily large —
            # never materialize it in driver memory at once
            shutil.copyfileobj(src, out, 1 << 20)


def export_networkx(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """NetworkX-compatible export (data_exporter.py:618-668). The
    reference pickles a driver-built DiGraph — inherently single-node;
    here the graph is written as node-link JSON (the format
    ``networkx.node_link_graph`` loads), with the node/link arrays
    rendered distributed and only the O(1) envelope assembled
    driver-side."""
    node_lines = nodes.select(F.to_json(F.struct(
        F.col("node_id").alias("id"),
        *[F.col(c) for c in nodes.columns if c != "node_id"])).alias("line"))
    edge_lines = edges.select(F.to_json(F.struct(
        F.col("from_id").alias("source"), F.col("to_id").alias("target"),
        *[F.col(c) for c in edges.columns if c not in ("from_id", "to_id")]
    )).alias("line"))
    ndir, edir = path + ".nodes", path + ".links"
    node_lines.coalesce(1).write.mode("overwrite").text(ndir)
    edge_lines.coalesce(1).write.mode("overwrite").text(edir)

    def stream(out, body_dir):
        part = next(f for f in os.listdir(body_dir) if f.startswith("part-"))
        first = True
        with open(os.path.join(body_dir, part)) as src:
            for line in src:
                line = line.rstrip("\n")
                if not line:
                    continue
                out.write(("" if first else ",\n    ") + line)
                first = False

    with open(path, "w") as out:
        out.write('{"directed": true, "multigraph": false, "graph": {},\n'
                  '  "nodes": [\n    ')
        stream(out, ndir)
        out.write('\n  ],\n  "links": [\n    ')
        stream(out, edir)
        out.write("\n  ]\n}\n")


def export_xml(df: DataFrame, path: str, row_tag: str = "row",
               root_tag: str = "rows") -> None:
    """Generic XML export (data_exporter.py XML writer shape): one
    element per row, one child element per column — body rendered
    distributed, O(1) header/footer driver-side."""
    cols = df.columns
    parts = [F.lit(f"  <{row_tag}>")]
    for c in cols:
        parts.append(F.lit(f"<{c}>"))
        parts.append(F.coalesce(_xml_escape(F.col(c)), F.lit("")))
        parts.append(F.lit(f"</{c}>"))
    parts.append(F.lit(f"</{row_tag}>"))
    body_dir = path + ".body"
    df.select(F.concat(*parts).alias("line")) \
        .coalesce(1).write.mode("overwrite").text(body_dir)
    part = next(f for f in os.listdir(body_dir) if f.startswith("part-"))
    with open(path, "w") as out:
        out.write(f'<?xml version="1.0" encoding="UTF-8"?>\n<{root_tag}>\n')
        with open(os.path.join(body_dir, part)) as src:
            # chunked copy: the body part can be arbitrarily large —
            # never materialize it in driver memory at once
            shutil.copyfileobj(src, out, 1 << 20)
        out.write(f"</{root_tag}>\n")


def import_xml(spark: SparkSession, path: str, row_tag: str = "row") -> DataFrame:
    """XML import (data_importer.py XML path): parse with the stdlib
    ElementTree inside mapInPandas — file list distributes; schema is
    inferred from the first row element's children (all strings, like
    the reference's string-typed property bag)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    rows = root.findall(row_tag)
    if not rows:
        return spark.createDataFrame([], "value string")
    cols = [child.tag for child in rows[0]]
    data = [tuple((r.find(c).text or "") if r.find(c) is not None else None
                  for c in cols) for r in rows]
    # Driver-side parse is correct for the reference's single-file XML
    # interchange; a many-file corpus would wrap this same ET logic in
    # mapInPandas over a file-path DataFrame.
    return spark.createDataFrame(data, ", ".join(f"`{c}` string" for c in cols))


def detect_format(path: str) -> str:
    """Format auto-detect (data_importer.py:153-193): by extension, then
    content sniff."""
    low = path.lower()
    for ext, fmt in ((".json", "json"), (".csv", "csv"), (".xml", "xml"),
                     (".parquet", "parquet")):
        if low.endswith(ext):
            return fmt
    with open(path, "rb") as fh:
        head = fh.read(64).lstrip()
    if head.startswith(b"<?xml") or head.startswith(b"<"):
        return "xml"
    if head.startswith(b"{") or head.startswith(b"["):
        return "json"
    return "csv"


def export_subgraph(nodes: DataFrame, edges: DataFrame, node_ids: list[str],
                    path: str, fmt: str = "json",
                    include_relationships: bool = True) -> None:
    """Subgraph export (enhanced_mcp_endpoint.py:1104-1213): semi-join on
    the id list, then the chosen writer; edges keep only fully-interior
    ones (induced)."""
    from memory_engine_spark.operators.graph import induced_subgraph

    spark = nodes.sparkSession
    ids = spark.createDataFrame([(i,) for i in node_ids], "node_id string")
    sel_nodes = nodes.join(F.broadcast(ids), "node_id", "left_semi")
    # Every graph-shaped writer gets an EMPTY edge frame (not None) when
    # relationships are excluded, so no branch can NPE on .select.
    sel_edges = (induced_subgraph(edges, ids) if include_relationships
                 else spark.createDataFrame(
                     [], "from_id string, to_id string, relation_type string"))
    if fmt == "json":
        export_json(sel_nodes, os.path.join(path, "nodes"))
        if include_relationships:
            export_json(sel_edges, os.path.join(path, "edges"))
    elif fmt == "csv":
        export_csv(sel_nodes, os.path.join(path, "nodes"))
        if include_relationships:
            export_csv(sel_edges, os.path.join(path, "edges"))
    elif fmt == "graphml":
        export_graphml(sel_nodes, sel_edges, os.path.join(path, "graph.graphml"))
    elif fmt == "cypher":
        export_cypher(sel_nodes, sel_edges, os.path.join(path, "graph.cypher"))
    elif fmt == "gremlin":
        export_gremlin(sel_nodes, sel_edges, os.path.join(path, "graph.gremlin"))
    elif fmt == "rdf":
        export_rdf(sel_nodes, sel_edges, os.path.join(path, "graph.ttl"))
    elif fmt == "networkx":
        export_networkx(sel_nodes, sel_edges, os.path.join(path, "graph.json"))
    else:
        raise ValueError(f"unsupported format: {fmt!r}")


def import_with_merge(spark: SparkSession, path: str, existing: DataFrame,
                      key: str, schema: str | None = None,
                      fmt: str | None = None) -> DataFrame:
    """Import + validate + merge-duplicates (data_importer.py:42-553):
    auto-detect format, enforce/align schema, drop exact in-file
    duplicate keys (first wins deterministically by sort), MERGE into
    the existing table (imported rows win on key conflict)."""
    from memory_engine_spark.operators.merging import upsert

    fmt = fmt or detect_format(path)
    if fmt == "json":
        incoming = import_json(spark, path, schema)
    elif fmt == "csv":
        incoming = import_csv(spark, path, schema)
    elif fmt == "xml":
        incoming = import_xml(spark, path)
    elif fmt == "parquet":
        incoming = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported import format {fmt!r}")
    missing = set(existing.columns) - set(incoming.columns)
    if missing:
        raise ValueError(f"import missing required columns: {sorted(missing)}")
    incoming = incoming.select(*existing.columns)
    for col, dtype in existing.dtypes:  # align types (csv/xml import as string)
        incoming = incoming.withColumn(col, F.col(col).cast(dtype))
    # Deterministic in-file survivor: the row that sorts first across all
    # non-key columns wins (dropDuplicates keeps an ARBITRARY row). Map
    # columns aren't orderable — fall back to arbitrary-row semantics.
    others = [c for c, t in incoming.dtypes if c != key and not t.startswith("map<")]
    if others and len(others) == len(incoming.columns) - 1:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(*[F.col(c).asc_nulls_last() for c in others])
        deduped = (incoming.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        deduped = incoming.dropDuplicates([key])
    return upsert(existing, deduped, key)


def migrate_and_verify(src: DataFrame, write_path: str, spark: SparkSession,
                       fmt: str = "parquet") -> bool:
    """Backend migration with verification (backend_migrator.py:1-463):
    copy then check exceptAll both ways is empty. Column order is
    realigned to the source before comparing — schema-on-read backends
    (JSON sorts fields alphabetically) permute columns, which is a
    layout change, not a data change."""
    getattr(src.write.mode("overwrite"), fmt)(write_path)
    back = getattr(spark.read, fmt)(write_path)
    # A verifier REPORTS failure, it doesn't raise (r05 ADVICE): a
    # lossy writer can drop a column entirely (JSON omits all-null
    # fields), and duplicate source column names make the realigning
    # select ambiguous — both are verification failures, not errors.
    if len(set(src.columns)) != len(src.columns):
        return False
    if not set(src.columns) <= set(back.columns):
        return False
    back = back.select(*src.columns)
    return back.exceptAll(src).isEmpty() and src.exceptAll(back).isEmpty()
