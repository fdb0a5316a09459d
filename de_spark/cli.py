"""CLI with the reference's verb surface (src/main.rs:19-62):

  python -m de_spark create -o OUT_DIR -d FILE [FILE...]
  python -m de_spark query  -d DATA [DATA...] -s QUERY.rq [-o FORMAT]
  python -m de_spark view   -d OUT_DIR

``create`` materializes a KG store from RDF files (one graph per file,
like `de query`'s implicit per-file graphs, or --single-graph NAME to
merge like `de create`).  ``query`` accepts either a materialized
store dir or raw RDF files (built on the fly — the reference also
rdf2hdt's raw RDF before querying, src/query.rs:264-297).  ``view``
prints the VOID stats (src/view.rs:52-55).

The ``serve`` verb (SPARQL-over-HTTP) is intentionally not ported —
SURVEY.md §7 risk 6.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from de_spark.session import get_spark


def _build_from_files(spark, files, out_dir, single_graph=None):
    from de_spark.pipeline import build
    from de_spark.sources import read_rdf

    raw, unhandled, warnings = read_rdf(spark, files, single_graph=single_graph)
    for w in warnings:
        print(f"warning: {w}", file=sys.stderr)
    for p in unhandled:
        print(f"warning: unhandled file type: {p}", file=sys.stderr)
    return build(raw, out_dir)


def cmd_create(args) -> int:
    spark = get_spark("de_create")
    kg, stages = _build_from_files(spark, args.data, args.output, args.single_graph)
    for s in stages:
        print(f"stage {s.name}: rows={s.rows} wall_ms={s.wall_ms}", file=sys.stderr)
    return 0


def cmd_query(args) -> int:
    from de_spark.graph import KnowledgeGraph
    from de_spark.query import results as res
    from de_spark.query import sparql_select

    spark = get_spark("de_query")
    import os

    if len(args.data) == 1 and os.path.isdir(args.data[0]):
        kg = KnowledgeGraph.load(spark, args.data[0])
    else:
        tmp = tempfile.mkdtemp(prefix="de_query_")
        kg, _ = _build_from_files(spark, args.data, tmp)

    import re as _re

    from de_spark.query.sparql import parse_sparql, sparql_construct, sparql_describe
    from de_spark.query.sparql import execute as sparql_execute
    from de_spark.sources.rdf_writers import render_ntriples

    for qf in args.query:
        with open(qf) as f:
            q = f.read()
        if _re.search(r"\bCONSTRUCT\b", q, _re.I) or _re.search(r"\bDESCRIBE\b", q, _re.I):
            # CONSTRUCT/DESCRIBE → RDF graph output, like the
            # reference's graph-format routing (src/query.rs:155-175);
            # -o picks the serialization (NT default; solution formats
            # csv/tsv/json/xml fall back to NT like `de`'s default)
            from de_spark.sources.rdf_writers import (
                render_nquads,
                render_trig_lines,
                render_turtle_lines,
                write_rdfxml,
            )
            from pyspark.sql import functions as F

            is_describe = bool(_re.search(r"\bDESCRIBE\b", q, _re.I))
            g = sparql_describe(kg, q) if is_describe else sparql_construct(kg, q)
            if args.output == "rdfxml":
                # streamed straight to stdout — constant driver memory
                write_rdfxml(g, sys.stdout)
                print()
                continue
            line_renderers = {
                "nq": render_nquads,
                "trig": render_trig_lines,
                "ttl": render_turtle_lines,
                "turtle": render_turtle_lines,
                # N3 is a superset of Turtle: the Turtle-lines rendering
                # is a valid N3 document (completes the reference's six
                # graph formats, src/query.rs:155-175)
                "n3": render_turtle_lines,
            }
            if args.output in ("nq", "trig"):
                g = g.withColumn("graph", F.lit("file:///constructed"))
            render = line_renderers.get(args.output, render_ntriples)
            for r in render(g).toLocalIterator():
                print(r["line"])
            continue
        parsed = parse_sparql(q)
        graph_formats = {"nt", "nq", "ttl", "turtle", "n3", "trig", "rdfxml"}
        if args.output in graph_formats:
            # graph serializations only make sense for CONSTRUCT/DESCRIBE
            # (mirror of the reference's per-variant format routing,
            # src/query.rs:102-176); fall back to the CSV default like
            # the CONSTRUCT path falls back to NT for solution formats
            print(
                f"warning: -o {args.output} requires CONSTRUCT/DESCRIBE; using csv",
                file=sys.stderr,
            )
            args.output = "csv"
        if parsed.ask:
            # boolean serializations match the reference's sparesults
            # shapes ('true' CSV/TSV, {"head":{},"boolean":true} JSON —
            # src/query.rs:133-144), not a generic 1-row DataFrame dump
            value = sparql_execute(kg, parsed).limit(1).count() > 0
            emit_ask = {
                "csv": res.ask_to_csv,
                "tsv": res.ask_to_tsv,
                "json": res.ask_to_json,
                "xml": res.ask_to_xml,
            }[args.output]
            print(emit_ask(value))
            continue
        sols = sparql_select(kg, q)
        # streamed chunk-by-chunk to stdout (constant driver memory;
        # CSV joins with \r\n, the others are pre-chunked documents)
        emit_iter, sep = {
            "csv": (res.iter_csv, "\r\n"),
            "tsv": (res.iter_tsv, "\n"),
            "json": (res.iter_json, ""),
            "xml": (res.iter_xml, ""),
        }[args.output]
        first = True
        for chunk in emit_iter(sols):
            if not first and sep:
                sys.stdout.write(sep)
            first = False
            sys.stdout.write(chunk)
        sys.stdout.write("\n")
    return 0


def cmd_load(args) -> int:
    """SPARQL-UPDATE LOAD equivalent: RDF files → NEW named graphs in an
    existing store.  The reference validates LOAD but leaves it
    unimplemented (src/serve.rs:1045-1061 'not yet implemented'); here
    it is the batch mutation surface: read_rdf + add_graph (existing
    graphs are immutable and refused)."""
    from de_spark import store
    from de_spark.sources import read_rdf

    spark = get_spark("de_load")
    raw, unhandled, warnings = read_rdf(spark, args.files)
    for w in warnings:
        print(f"warning: {w}", file=sys.stderr)
    for p in unhandled:
        print(f"warning: unhandled file type: {p}", file=sys.stderr)
    try:
        store.add_graph(spark, args.data, raw)
    except store.GraphExistsError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


def cmd_update(args) -> int:
    """SPARQL UPDATE string surface (reference src/serve.rs:783-1121):
    CREATE / INSERT DATA into new graphs / LOAD INTO GRAPH /
    CLEAR|DROP GRAPH, with DELETE forms refused (read-only triples)."""
    from de_spark import store
    from de_spark.query.update import UpdateRefusedError

    spark = get_spark("de_update")
    if args.update:
        text = args.update
    else:
        with open(args.file) as f:
            text = f.read()
    try:
        for line in store.execute_update(spark, args.data, text):
            print(line, file=sys.stderr)
    except (UpdateRefusedError, store.GraphExistsError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


def cmd_view(args) -> int:
    spark = get_spark("de_view")
    stats = spark.read.parquet(f"{args.data}/stats")
    for r in stats.orderBy("graph").collect():
        print(f"graph: {r['graph']}")
        print(f"  triples: {r['triples']}")
        print(f"  properties: {r['properties']}")
        print(f"  distinctSubjects: {r['distinct_subjects']}")
        print(f"  distinctObjects: {r['distinct_objects']}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="de_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="build a KG store from RDF files")
    c.add_argument("-o", "--output", required=True)
    c.add_argument("-d", "--data", nargs="+", required=True)
    c.add_argument("--single-graph", default=None)
    c.set_defaults(fn=cmd_create)

    q = sub.add_parser("query", help="run SPARQL over a store dir or RDF files")
    q.add_argument("-d", "--data", nargs="+", required=True)
    q.add_argument("-s", "--query", nargs="+", required=True)
    q.add_argument(
        "-o",
        "--output",
        default="csv",
        choices=["csv", "tsv", "json", "xml", "nt", "nq", "ttl", "turtle", "n3", "trig", "rdfxml"],
        help="solution format for SELECT/ASK; graph format for CONSTRUCT/DESCRIBE",
    )
    q.set_defaults(fn=cmd_query)

    v = sub.add_parser("view", help="print VOID stats of a store")
    v.add_argument("-d", "--data", required=True)
    v.set_defaults(fn=cmd_view)

    up = sub.add_parser("update", help="run a SPARQL UPDATE string against a store")
    up.add_argument("-d", "--data", required=True, help="store directory")
    up.add_argument("-u", "--update", default=None, help="inline update string")
    up.add_argument("-f", "--file", default=None, help="update file (.ru)")
    up.set_defaults(fn=cmd_update)

    ld = sub.add_parser("load", help="LOAD RDF files into a store as new named graphs")
    ld.add_argument("-d", "--data", required=True, help="store directory")
    ld.add_argument("-f", "--files", nargs="+", required=True)
    ld.set_defaults(fn=cmd_load)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
