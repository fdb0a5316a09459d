"""SPARQL result serializers: CSV / TSV / JSON / XML (SELECT + ASK).

Byte-shape contract comes from the reference's golden assertions
(tests/test-commands.rs:186-238):

- CSV: header = bare var names; IRIs bare; literals = lexical form.
- TSV: header = ``?var``; IRIs in ``<>``; literals quoted with suffix.
- JSON: ``{"head":{"vars":[…]},"results":{"bindings":[{var:{"type":…,
  "value":…}}…]}}`` — no spaces.
- XML: ``<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/
  sparql-results#">…`` — no declaration spaces.

The string emitters here stream via ``toLocalIterator`` (constant driver
memory, like the reference's ReadForWrite adapter, src/serve.rs:1427).
For cluster-scale exports use ``write_csv`` which writes distributed
files of the same row shape.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame

from de_spark import terms


def _rows(solutions: DataFrame) -> Iterator:
    return solutions.toLocalIterator()


def iter_csv(solutions: DataFrame) -> Iterator[str]:
    """Stream sparesults-CSV lines (header first) — one row in driver
    memory at a time via ``toLocalIterator`` (the reference streams
    serialization as it reads, src/serve.rs:1427-1502).  ``to_csv``
    is the joined-string twin; byte shapes are identical."""
    cols = solutions.columns
    yield ",".join(cols)
    for row in _rows(solutions):
        vals = []
        for c in cols:
            t = row[c]
            if t is None:
                vals.append("")
            elif not isinstance(t, str):
                vals.append(str(t))
            elif t.startswith('"'):
                v, _, _ = terms.literal_parts_py(t)
                # RFC4180 quoting when needed
                if any(ch in v for ch in ",\"\n\r"):
                    v = '"' + v.replace('"', '""') + '"'
                vals.append(v)
            else:
                vals.append(t)
        yield ",".join(vals)


def to_csv(solutions: DataFrame) -> str:
    return "\r\n".join(iter_csv(solutions))


def iter_tsv(solutions: DataFrame) -> Iterator[str]:
    """Stream sparesults-TSV lines (see :func:`iter_csv`)."""
    cols = solutions.columns
    yield "\t".join("?" + c for c in cols)
    for row in _rows(solutions):
        vals = []
        for c in cols:
            t = row[c]
            if t is None:
                vals.append("")
            elif not isinstance(t, str):
                vals.append(f'"{t}"')
            elif t.startswith('"') or t.startswith("_"):
                vals.append(t)
            else:
                vals.append(f"<{t}>")
        yield "\t".join(vals)


def to_tsv(solutions: DataFrame) -> str:
    return "\n".join(iter_tsv(solutions))


def _json_term(t) -> dict:
    if not isinstance(t, str):
        # aggregate result (numeric) — a plain literal in SPARQL terms
        return {"type": "literal", "value": str(t)}
    kind = terms.classify_py(t)
    if kind == terms.KIND_IRI:
        return {"type": "uri", "value": t}
    if kind == terms.KIND_BNODE:
        return {"type": "bnode", "value": t[2:]}
    value, dt, lang = terms.literal_parts_py(t)
    d = {"type": "literal", "value": value}
    if dt:
        d["datatype"] = dt
    if lang:
        d["xml:lang"] = lang
    return d


def iter_json(solutions: DataFrame) -> Iterator[str]:
    """Stream the sparesults-JSON document in chunks: envelope, then
    one binding object per row — never the whole bindings list in
    driver memory.  Byte-identical to ``to_json``."""
    cols = solutions.columns
    yield (
        '{"head":{"vars":'
        + json.dumps(cols, separators=(",", ":"))
        + '},"results":{"bindings":['
    )
    first = True
    for row in _rows(solutions):
        b = {}
        for c in cols:
            if row[c] is not None:
                b[c] = _json_term(row[c])
        chunk = json.dumps(b, separators=(",", ":"))
        yield chunk if first else "," + chunk
        first = False
    yield "]}}"


def to_json(solutions: DataFrame) -> str:
    return "".join(iter_json(solutions))


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def iter_xml(solutions: DataFrame) -> Iterator[str]:
    """Stream the sparesults-XML document: envelope chunks, then one
    ``<result>…</result>`` chunk per row.  Byte-identical to
    ``to_xml``."""
    cols = solutions.columns
    yield '<?xml version="1.0"?>'
    yield '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
    yield "<head>" + "".join(f'<variable name="{c}"/>' for c in cols) + "</head>"
    yield "<results>"
    for row in _rows(solutions):
        parts = ["<result>"]
        for c in cols:
            t = row[c]
            if t is None:
                continue
            if not isinstance(t, str):
                parts.append(f'<binding name="{c}"><literal>{t}</literal></binding>')
                continue
            kind = terms.classify_py(t)
            if kind == terms.KIND_IRI:
                inner = f"<uri>{_xml_escape(t)}</uri>"
            elif kind == terms.KIND_BNODE:
                inner = f"<bnode>{_xml_escape(t[2:])}</bnode>"
            else:
                value, dt, lang = terms.literal_parts_py(t)
                attrs = ""
                if dt:
                    attrs = f' datatype="{_xml_escape(dt)}"'
                elif lang:
                    attrs = f' xml:lang="{lang}"'
                inner = f"<literal{attrs}>{_xml_escape(value)}</literal>"
            parts.append(f'<binding name="{c}">{inner}</binding>')
        parts.append("</result>")
        yield "".join(parts)
    yield "</results></sparql>"


def to_xml(solutions: DataFrame) -> str:
    return "".join(iter_xml(solutions))


def ask_to_json(value: bool) -> str:
    return json.dumps({"head": {}, "boolean": value}, separators=(",", ":"))


def ask_to_csv(value: bool) -> str:
    """sparesults boolean CSV/TSV: the bare lowercase word
    (reference S9 ASK routing, src/query.rs:133-144)."""
    return "true" if value else "false"


ask_to_tsv = ask_to_csv


def ask_to_xml(value: bool) -> str:
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        f"<head></head><boolean>{'true' if value else 'false'}</boolean></sparql>"
    )


def write_csv(solutions: DataFrame, path: str) -> None:
    """Distributed CSV export (S9 at scale): same cell shapes as to_csv."""
    from pyspark.sql import functions as F

    out = solutions.select(
        *[terms.sparql_csv_form(F.col(c)).alias(c) for c in solutions.columns]
    )
    out.write.mode("overwrite").option("header", True).csv(path)
