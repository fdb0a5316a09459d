"""SPARQL-lite: parser + executor for the subset the reference's own
query corpus exercises (SURVEY.md §7 risk 5): PREFIX, SELECT
[DISTINCT] vars|*, WHERE { BGP with ';'/',' continuations and property
paths (/ | ^ +), FILTER (incl. scoped inside OPTIONAL), OPTIONAL
{ BGP }, n-ary UNION chains, GRAPH <g>/GRAPH ?g blocks, VALUES },
ORDER BY [ASC|DESC](?v), LIMIT, OFFSET, GROUP BY + aggregates +
HAVING, plus ASK, CONSTRUCT and DESCRIBE.  The reference gets full SPARQL 1.1 from
oxigraph's spareval (src/sparql.rs:516-521); what remains beyond this
subset (property paths, subqueries, nested group graph patterns) is
declared P2 — the DataFrame layer underneath already supports the
relational equivalents directly.

FILTER library: comparisons (term/numeric), REGEX, BOUND,
isIRI/isURI/isLiteral/isBlank, LANG/DATATYPE/STR equality,
STRSTARTS/STRENDS/CONTAINS, STRLEN comparisons, IN/NOT IN, &&/||.

Execution: BGP → compile_bgp (uid joins) → single-variable FILTERs
bound in UID SPACE (predicate evaluated over the vocabulary-sized
term_uids table, broadcast semi-join into the solutions — the large
intermediate never decodes just to be filtered) → decode variables to
term strings → multi-var FILTERs as Catalyst predicates →
DISTINCT/ORDER/LIMIT.  ORDER runs on decoded strings, matching the
reference's string-typed term ordering (SURVEY.md §2.6 O1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_spark import terms
from de_spark.graph import KnowledgeGraph
from de_spark.query.bgp import TriplePattern, compile_bgp

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@dataclass
class Aggregate:
    func: str          # count | sum | avg | min | max | sample | group_concat
    var: str           # source var name or '*'
    alias: str
    distinct: bool = False


@dataclass
class OptionalBlock:
    patterns: list[TriplePattern]
    filters: list[str] = field(default_factory=list)  # scoped to this block


@dataclass
class SelectQuery:
    variables: list[str]          # projected var names, [] ⇒ all (SELECT *)
    patterns: list[TriplePattern]
    optionals: list[OptionalBlock] = field(default_factory=list)
    unions: list[list[TriplePattern]] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)  # raw filter expressions
    distinct: bool = False
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    offset: int | None = None
    ask: bool = False
    aggregates: list[Aggregate] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: list[str] = field(default_factory=list)  # post-agg numeric filters
    values_vars: list[str] = field(default_factory=list)   # VALUES clause vars
    values_rows: list[list[str]] = field(default_factory=list)  # resolved term rows


_PREFIX_RE = re.compile(r"PREFIX\s+([\w-]*):\s*<([^>]*)>", re.I)
_SELECT_RE = re.compile(r"(SELECT|ASK)\s+(DISTINCT\s+)?([^{]*?)\s*(?:WHERE\s*)?\{", re.I | re.S)
_ORDER_RE = re.compile(r"ORDER\s+BY\s+((?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+)(?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))*)", re.I)
_ORDER_ITEM_RE = re.compile(r"(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+)", re.I)
_LIMIT_RE = re.compile(r"LIMIT\s+(\d+)", re.I)
_OFFSET_RE = re.compile(r"OFFSET\s+(\d+)", re.I)

_TERM_RE = re.compile(
    r"""\s*(
        \?[\w]+
      | <[^>]*>
      | "(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|\^\^[\w-]+:[\w.-]*|@[A-Za-z0-9-]+)?
      | _:[\w-]+
      | [A-Za-z_][\w-]*:[\w.-]*
      | \ba\b
      | true|false
      | [+-]?\d+(?:\.\d+)?
    )\s*""",
    re.VERBOSE,
)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _strip_comments(q: str) -> str:
    out = []
    for line in q.splitlines():
        # '#' starts a comment unless inside an IRI or literal — good
        # enough for the supported subset: cut at '#' not preceded by <…
        cut = len(line)
        in_quote = False
        in_iri = False
        for i, ch in enumerate(line):
            if ch == '"' and not in_iri:
                in_quote = not in_quote
            elif ch == "<" and not in_quote:
                in_iri = True
            elif ch == ">" and not in_quote:
                in_iri = False
            elif ch == "#" and not in_quote and not in_iri:
                cut = i
                break
        out.append(line[:cut])
    return "\n".join(out)


def _resolve_term(tok: str, prefixes: dict[str, str]) -> str:
    if tok.startswith("?") or tok.startswith("_:"):
        return tok
    if tok.startswith("<"):
        return tok[1:-1]
    if tok.startswith('"'):
        m = re.match(r'^(".*")\^\^([\w-]+):([\w.-]*)$', tok, re.S)
        if m:
            return f"{m.group(1)}^^<{prefixes[m.group(2)]}{m.group(3)}>"
        return tok
    if tok == "a":
        return RDF_TYPE
    if tok in ("true", "false"):
        return f'"{tok}"^^<{XSD}boolean>'
    if re.match(r"^[+-]?\d+$", tok):
        return f'"{tok}"^^<{XSD}integer>'
    if re.match(r"^[+-]?\d+\.\d+$", tok):
        return f'"{tok}"^^<{XSD}decimal>'
    pfx, local = tok.split(":", 1)
    return prefixes[pfx] + local


_PATH_ATOM_TOK = re.compile(r"<[^>]*>|[A-Za-z_][\w-]*:[\w.-]*|a(?![\w:])")


def _try_parse_path(body: str, pos: int, prefixes: dict[str, str]) -> tuple[str | None, int]:
    """Try to read a property-path expression (/, |, ^, +, parens) at
    ``pos``.  Returns (normalized "path:…" string, new pos) or
    (None, pos) when the token is a plain term.  Zero-length operators
    * and ? are rejected loudly (a '?' followed by a name char is the
    next VARIABLE, not a path op)."""
    i, out, depth = pos, [], 0
    has_op = False
    expect_atom = True
    n = len(body)
    while i < n:
        while i < n and body[i].isspace():
            i += 1
        if i >= n:
            break
        ch = body[i]
        if expect_atom:
            if ch == "^":
                out.append("^")
                has_op = True
                i += 1
                continue
            if ch == "(":
                out.append("(")
                depth += 1
                has_op = True
                i += 1
                continue
            m = _PATH_ATOM_TOK.match(body, i)
            if not m:
                return None, pos
            out.append(f"<{_resolve_term(m.group(0), prefixes)}>")
            i = m.end()
            expect_atom = False
            continue
        if ch == "+":
            out.append("+")
            has_op = True
            i += 1
            continue
        if ch in "*?":
            if ch == "?" and i + 1 < n and (body[i + 1].isalnum() or body[i + 1] == "_"):
                break  # next variable, not a path operator
            raise ValueError("zero-length path operators * and ? are unsupported")
        if ch == ")":
            if depth == 0:
                break
            out.append(")")
            depth -= 1
            i += 1
            continue
        if ch in "/|":
            out.append(ch)
            has_op = True
            i += 1
            expect_atom = True
            continue
        break
    if depth != 0 or expect_atom or not has_op:
        return None, pos
    return "path:" + "".join(out), i


def _parse_bgp(body: str, prefixes: dict[str, str]) -> list[TriplePattern]:
    """Parse 'term term term [;|,|.]…' with Turtle-style continuations.
    Predicates may be property-path expressions."""
    patterns: list[TriplePattern] = []
    pos = 0
    subj = pred = None
    state = "s"
    body = body.strip()
    while pos < len(body):
        ch = body[pos]
        if ch.isspace():
            pos += 1
            continue
        if ch in ".;,":
            # continuation punctuation: '.' new subject, ';' keep subject,
            # ',' keep subject+predicate (Turtle-style, like query-color.rq)
            state = {".": "s", ";": "p", ",": "o"}[ch]
            pos += 1
            continue
        if state == "p" and not body.startswith("?", pos):
            path, newpos = _try_parse_path(body, pos, prefixes)
            if path is not None:
                pred, state, pos = path, "o", newpos
                continue
        m = _TERM_RE.match(body, pos)
        if not m:
            raise ValueError(f"cannot parse BGP at: {body[pos:pos+40]!r}")
        tok = _resolve_term(m.group(1), prefixes)
        pos = m.end()
        if state == "s":
            subj, state = tok, "p"
        elif state == "p":
            pred, state = tok, "o"
        else:
            patterns.append(TriplePattern(subj, pred, tok))
            state = "s"  # default: next term starts a new statement
    return patterns


def parse_sparql(query: str) -> SelectQuery:
    q = _strip_comments(query)
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(q)}
    m = _SELECT_RE.search(q)
    if not m:
        raise ValueError("only SELECT/ASK queries are supported")
    ask = m.group(1).upper() == "ASK"
    distinct = bool(m.group(2))
    proj = m.group(3).strip()

    # aggregate projections: (AGG([DISTINCT] ?v|*) AS ?alias)
    aggregates: list[Aggregate] = []
    agg_re = re.compile(
        r"\(\s*(COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)\s+AS\s+\?(\w+)\s*\)",
        re.I,
    )
    for am in agg_re.finditer(proj):
        aggregates.append(
            Aggregate(
                func=am.group(1).lower(),
                var=am.group(3).lstrip("?"),
                alias=am.group(4),
                distinct=bool(am.group(2)),
            )
        )
    proj_wo_aggs = agg_re.sub(" ", proj)
    variables = [] if (ask or proj == "*" or not proj) else re.findall(r"\?(\w+)", proj_wo_aggs)

    # WHERE body: between the first '{' and its matching '}'
    start = m.end() - 1
    depth = 0
    end = start
    for i in range(start, len(q)):
        if q[i] == "{":
            depth += 1
        elif q[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    body = q[start + 1 : end]
    tail = q[end + 1 :]

    filters: list[str] = []
    optionals: list[OptionalBlock] = []
    unions: list[list[TriplePattern]] = []

    # extract FILTER(...) clauses from a text fragment into ``sink``
    def take_filters(text: str, sink: list[str]) -> str:
        out = text
        for fm in re.finditer(r"FILTER\s*\(", out, re.I):
            start_f = fm.end() - 1
            d = 0
            for i in range(start_f, len(out)):
                if out[i] == "(":
                    d += 1
                elif out[i] == ")":
                    d -= 1
                    if d == 0:
                        sink.append(out[start_f + 1 : i])
                        out = out[: fm.start()] + " " + out[i + 1 :]
                        return take_filters(out, sink)
        return out

    # OPTIONAL { … } blocks FIRST — so a FILTER written inside an
    # OPTIONAL is scoped to that block (left-join side) instead of
    # being silently hoisted to the top level (which would drop rows
    # SPARQL semantics keep: unbound optional var → top-level filter
    # eliminates the row instead of leaving it unextended)
    def take_optionals(text: str) -> str:
        pat = re.compile(r"OPTIONAL\s*\{", re.I)
        while True:
            bm = pat.search(text)
            if not bm:
                return text
            d = 0
            for i in range(bm.end() - 1, len(text)):
                if text[i] == "{":
                    d += 1
                elif text[i] == "}":
                    d -= 1
                    if d == 0:
                        block_filters: list[str] = []
                        block_body = take_filters(text[bm.end() : i], block_filters)
                        optionals.append(
                            OptionalBlock(_parse_bgp(block_body, prefixes), block_filters)
                        )
                        text = text[: bm.start()] + " " + text[i + 1 :]
                        break
            else:
                raise ValueError("unbalanced OPTIONAL block")

    # GRAPH <g> { BGP } — named-graph restriction on the contained
    # patterns (the reference's graph filter surface,
    # src/sparql.rs:436-453); GRAPH ?g binds the graph name per solution
    graph_patterns: list[TriplePattern] = []

    def take_graphs(text: str) -> str:
        pat = re.compile(r"GRAPH\s+(\?\w+|<[^>]*>|[A-Za-z_][\w-]*:[\w.-]*)\s*\{", re.I)
        while True:
            gm2 = pat.search(text)
            if not gm2:
                return text
            gterm = gm2.group(1)
            graph_iri = gterm if gterm.startswith("?") else _resolve_term(gterm, prefixes)
            d = 0
            for i in range(gm2.end() - 1, len(text)):
                if text[i] == "{":
                    d += 1
                elif text[i] == "}":
                    d -= 1
                    if d == 0:
                        for p in _parse_bgp(text[gm2.end() : i], prefixes):
                            graph_patterns.append(
                                TriplePattern(p.s, p.p, p.o, graph=graph_iri)
                            )
                        text = text[: gm2.start()] + " " + text[i + 1 :]
                        break
            else:
                raise ValueError("unbalanced GRAPH block")

    # VALUES ?x { t… } | VALUES (?x ?y) { (t t)… } — inline bindings in
    # CONSTRAINT form: the listed vars must be bound by the BGP and the
    # solutions are joined against the value rows (UNDEF is P2)
    values_vars: list[str] = []
    values_rows: list[list[str]] = []

    def take_values(text: str) -> str:
        vm = re.search(
            r"VALUES\s*(\?\w+|\([^)]*\))\s*\{([^{}]*)\}", text, re.I | re.S
        )
        if not vm:
            return text
        head, rows_text = vm.group(1), vm.group(2)
        values_vars.extend(re.findall(r"\?(\w+)", head))
        if re.search(r"\bUNDEF\b", rows_text, re.I):
            raise ValueError("VALUES UNDEF is unsupported")
        if head.startswith("?"):
            for tm in _TERM_RE.finditer(rows_text):
                values_rows.append([_resolve_term(tm.group(1), prefixes)])
        else:
            for rm in re.finditer(r"\(([^)]*)\)", rows_text):
                row = [_resolve_term(tm.group(1), prefixes) for tm in _TERM_RE.finditer(rm.group(1))]
                if len(row) != len(values_vars):
                    raise ValueError(f"VALUES row arity mismatch: {rm.group(0)!r}")
                values_rows.append(row)
        out = text[: vm.start()] + " " + text[vm.end() :]
        if re.search(r"\bVALUES\b", out, re.I):
            raise ValueError("multiple VALUES clauses are unsupported")
        return out

    body = take_graphs(body)
    body = take_optionals(body)
    body = take_values(body)
    body = take_filters(body, filters)

    # UNION: '{ A } UNION { B } [UNION { C } …]' — one n-ary chain of
    # brace groups (the reference gets arbitrary nesting from spareval;
    # a second independent chain is rejected loudly rather than wrongly)
    um = re.search(r"\{[^{}]*\}(?:\s*UNION\s*\{[^{}]*\})+", body, re.I | re.S)
    if um:
        for bm in re.finditer(r"\{([^{}]*)\}", um.group(0)):
            unions.append(_parse_bgp(bm.group(1), prefixes))
        body = body[: um.start()] + " " + body[um.end() :]
    if re.search(r"\bUNION\b", body, re.I):
        raise ValueError("multiple UNION chains / nested UNION are unsupported")

    # remaining braces are PLAIN groups — for conjunctive queries a
    # group join equals the flattened BGP (OPTIONAL/UNION/GRAPH/FILTER
    # were already extracted above), so strip them (outside literals)
    def strip_group_braces(text: str) -> str:
        out, in_q, esc = [], False, False
        for ch in text:
            if esc:
                out.append(ch)
                esc = False
                continue
            if ch == "\\" and in_q:
                out.append(ch)
                esc = True
                continue
            if ch == '"':
                in_q = not in_q
            if ch in "{}" and not in_q:
                out.append(" ")
            else:
                out.append(ch)
        return "".join(out)

    body = strip_group_braces(body)
    patterns = (_parse_bgp(body, prefixes) if body.strip() else []) + graph_patterns

    order_by: list[tuple[str, bool]] = []
    om = _ORDER_RE.search(tail)
    if om:
        for it in _ORDER_ITEM_RE.finditer(om.group(1)):
            if it.group(3):
                order_by.append((it.group(3), False))
            else:
                order_by.append((it.group(2), it.group(1).upper() == "DESC"))
    lm = _LIMIT_RE.search(tail)
    fm = _OFFSET_RE.search(tail)
    gm = re.search(r"GROUP\s+BY\s+((?:\?\w+\s*)+)", tail, re.I)
    group_by = re.findall(r"\?(\w+)", gm.group(1)) if gm else []
    having: list[str] = []
    hm = re.search(r"HAVING\s*\(", tail, re.I)
    if hm:
        d = 0
        for i in range(hm.end() - 1, len(tail)):
            if tail[i] == "(":
                d += 1
            elif tail[i] == ")":
                d -= 1
                if d == 0:
                    having.append(tail[hm.end() : i])
                    break

    return SelectQuery(
        variables=variables,
        patterns=patterns,
        optionals=optionals,
        unions=unions,
        filters=filters,
        distinct=distinct,
        order_by=order_by,
        limit=int(lm.group(1)) if lm else None,
        offset=int(fm.group(1)) if fm else None,
        ask=ask,
        aggregates=aggregates,
        group_by=group_by,
        having=having,
        values_vars=values_vars,
        values_rows=values_rows,
    )


# ---------------------------------------------------------------------------
# FILTER expression → Catalyst predicate (string-term semantics)
# ---------------------------------------------------------------------------

_CMP_RE = re.compile(r'^\s*\?(\w+)\s*(=|!=|<=|>=|<|>)\s*(.+?)\s*$')
_REGEX_RE = re.compile(r'^\s*REGEX\s*\(\s*\?(\w+)\s*,\s*"((?:[^"\\]|\\.)*)"\s*(?:,\s*"([a-z]*)")?\s*\)\s*$', re.I)
_BOUND_RE = re.compile(r"^\s*(!)?\s*BOUND\s*\(\s*\?(\w+)\s*\)\s*$", re.I)
_ISKIND_RE = re.compile(r"^\s*(!)?\s*(isIRI|isURI|isLiteral|isBlank)\s*\(\s*\?(\w+)\s*\)\s*$", re.I)
_FN_CMP_RE = re.compile(
    r'^\s*(LANG|DATATYPE|STR)\s*\(\s*\?(\w+)\s*\)\s*(=|!=)\s*(.+?)\s*$', re.I
)
_STRFN_RE = re.compile(
    r'^\s*(!)?\s*(STRSTARTS|STRENDS|CONTAINS)\s*\(\s*(?:STR\s*\(\s*)?\?(\w+)\s*\)?\s*,'
    r'\s*"((?:[^"\\]|\\.)*)"\s*\)\s*$',
    re.I,
)
_STRLEN_RE = re.compile(
    r"^\s*STRLEN\s*\(\s*(?:STR\s*\(\s*)?\?(\w+)\s*\)?\s*\)\s*(=|!=|<=|>=|<|>)\s*(\d+)\s*$",
    re.I,
)
_IN_RE = re.compile(r"^\s*\?(\w+)\s+(NOT\s+)?IN\s*\(([^)]*)\)\s*$", re.I)


def _filter_to_column(expr: str, prefixes: dict[str, str] | None = None):
    for part, op in (("&&", "and"), ("||", "or")):
        if part in expr:
            left, right = expr.split(part, 1)
            l, r = _filter_to_column(left), _filter_to_column(right)
            return (l & r) if op == "and" else (l | r)
    m = _REGEX_RE.match(expr)
    if m:
        var, pat, flags = m.group(1), m.group(2), m.group(3) or ""
        if "i" in flags:
            pat = "(?i)" + pat
        return terms.sparql_csv_form(F.col(var)).rlike(pat)
    m = _BOUND_RE.match(expr)
    if m:
        c = F.col(m.group(2)).isNotNull()
        return ~c if m.group(1) else c
    m = _ISKIND_RE.match(expr)
    if m:
        kind = {
            "isiri": terms.KIND_IRI,
            "isuri": terms.KIND_IRI,
            "isliteral": terms.KIND_LITERAL,
            "isblank": terms.KIND_BNODE,
        }[m.group(2).lower()]
        c = terms.classify(F.col(m.group(3))) == kind
        return ~c if m.group(1) else c
    m = _FN_CMP_RE.match(expr)
    if m:
        fn, var, op, rhs = m.group(1).lower(), m.group(2), m.group(3), m.group(4).strip()
        lhs = {
            "lang": terms.literal_lang(F.col(var)),
            "datatype": terms.literal_datatype(F.col(var)),
            "str": terms.sparql_csv_form(F.col(var)),
        }[fn]
        if rhs.startswith('"'):
            rv = re.match(r'^"((?:[^"\\]|\\.)*)"', rhs).group(1)
        elif rhs.startswith("<"):
            rv = rhs[1:-1]
        else:
            rv = rhs
        c = lhs == F.lit(rv)
        return c if op == "=" else ~c
    m = _STRFN_RE.match(expr)
    if m:
        neg, fn, var, arg = m.group(1), m.group(2).lower(), m.group(3), m.group(4)
        lhs = terms.sparql_csv_form(F.col(var))
        c = {
            "strstarts": lhs.startswith(arg),
            "strends": lhs.endswith(arg),
            "contains": lhs.contains(arg),
        }[fn]
        return ~c if neg else c
    m = _STRLEN_RE.match(expr)
    if m:
        var, op, n = m.group(1), m.group(2), int(m.group(3))
        lhs = F.length(terms.sparql_csv_form(F.col(var)))
        rv = F.lit(n)
        return {
            "=": lhs == rv, "!=": lhs != rv, "<": lhs < rv,
            "<=": lhs <= rv, ">": lhs > rv, ">=": lhs >= rv,
        }[op]
    m = _IN_RE.match(expr)
    if m:
        var, neg, items = m.group(1), m.group(2), m.group(3)
        vals = []
        for tok in re.findall(r'<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?', items):
            vals.append(tok[1:-1] if tok.startswith("<") else tok)
        c = F.col(var).isin(vals)
        return ~c if neg else c
    m = _CMP_RE.match(expr)
    if m:
        var, op, rhs = m.groups()
        rhs = rhs.strip()
        lhs = F.col(var)
        if re.match(r"^[+-]?\d+(\.\d+)?$", rhs):
            lhs = terms.literal_value(F.col(var)).cast("double")
            rval = F.lit(float(rhs))
        elif rhs.startswith('"'):
            mm = re.match(r'^"((?:[^"\\]|\\.)*)"', rhs)
            lhs = terms.sparql_csv_form(F.col(var))
            rval = F.lit(mm.group(1))
        elif rhs.startswith("<"):
            rval = F.lit(rhs[1:-1])
        elif rhs.startswith("?"):
            rval = F.col(rhs[1:])
        else:
            rval = F.lit(rhs)
        return {
            "=": lhs == rval,
            "!=": lhs != rval,
            "<": lhs < rval,
            "<=": lhs <= rval,
            ">": lhs > rval,
            ">=": lhs >= rval,
        }[op]
    raise ValueError(f"unsupported FILTER expression: {expr!r}")


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def _filter_vars(expr: str) -> set[str]:
    return set(re.findall(r"\?(\w+)", expr))


def _push_filter_uid(kg: KnowledgeGraph, sols: DataFrame, expr: str) -> DataFrame | None:
    """Evaluate a single-variable FILTER in uid space, BEFORE any term
    decode: the predicate runs over the (vocabulary-sized) term_uids
    table and binds into the solutions as a broadcast semi-join — the
    large intermediate never decodes just to be filtered (the round-1
    plan decoded every variable first; at scale that decode join of a
    big intermediate dominates).  Equivalent to post-decode filtering
    because decode IS the term_uids join: rows whose term fails the
    predicate — or whose var is NULL (unbound optional) — are dropped
    by both.  Returns None when not pushable (multi-var expressions).
    """
    vars_in = _filter_vars(expr)
    if len(vars_in) != 1:
        return None
    var = vars_in.pop()
    if var not in sols.columns:
        return None
    if dict(sols.dtypes).get(var) != "bigint":
        # already a string binding (GRAPH ?g) — filter it post-decode
        return None
    m = _BOUND_RE.match(expr)
    if m:
        # BOUND needs no term at all — it is a null test on the uid
        c = F.col(var).isNotNull()
        return sols.where(~c if m.group(1) else c)
    try:
        cond = _filter_to_column(expr)
    except ValueError:
        return None
    matching = (
        kg.term_uids.select(F.col("term").alias(var), "uid")
        .where(cond)
        .select(F.col("uid").alias(var))
    )
    return sols.join(F.broadcast(matching), var, "left_semi")


def execute(kg: KnowledgeGraph, q: SelectQuery) -> DataFrame:
    """Run a parsed query; returns solutions with *string* term columns."""
    if q.unions:
        branches = []
        for branch in q.unions:
            bq = SelectQuery(variables=q.variables, patterns=q.patterns + branch)
            branches.append(compile_bgp(kg, bq.patterns))
        all_vars = sorted({c for b in branches for c in b.columns})
        padded = [
            b.select(*[F.col(c) if c in b.columns else F.lit(None).cast("long").alias(c) for c in all_vars])
            for b in branches
        ]
        sols = padded[0]
        for b in padded[1:]:
            sols = sols.unionByName(b)
    else:
        sols = compile_bgp(kg, q.patterns)

    for opt in q.optionals:
        right = compile_bgp(kg, opt.patterns)
        # filters written inside OPTIONAL{…} scope to the right side of
        # the left join (applied before joining, in uid space)
        for f in opt.filters:
            if not _filter_vars(f) <= set(right.columns):
                raise ValueError(
                    f"FILTER inside OPTIONAL referencing outer variables is unsupported: {f!r}"
                )
            pushed = _push_filter_uid(kg, right, f)
            if pushed is None:
                raise ValueError(f"unsupported FILTER inside OPTIONAL: {f!r}")
            right = pushed
        shared = [c for c in right.columns if c in sols.columns]
        sols = sols.join(right, shared, "left")

    if q.values_vars:
        # VALUES joins in uid space: the value terms resolve to uids
        # through the vocabulary (a term absent from the graph matches
        # nothing, like any other constant bind), then one broadcast
        # inner join constrains the solutions
        missing = [v for v in q.values_vars if v not in sols.columns]
        if missing:
            raise ValueError(f"VALUES variables not bound by the BGP: {missing}")
        spark = sols.sparkSession
        vdf = spark.createDataFrame(
            [tuple(r) for r in q.values_rows], [f"__t_{v}" for v in q.values_vars]
        )
        for v in q.values_vars:
            vdf = vdf.join(
                kg.term_uids.select(
                    F.col("term").alias(f"__t_{v}"), F.col("uid").alias(v)
                ),
                f"__t_{v}",
            )
        sols = sols.join(
            F.broadcast(vdf.select(*q.values_vars).dropDuplicates()),
            q.values_vars,
            "inner",
        )

    # top-level filters: single-var expressions bind in uid space …
    post_decode: list[str] = []
    for f in q.filters:
        pushed = _push_filter_uid(kg, sols, f)
        if pushed is not None:
            sols = pushed
        else:
            post_decode.append(f)

    var_cols = list(sols.columns)
    decoded = kg.decode_vars(sols, var_cols)

    # … multi-var expressions (?a = ?b) run on the decoded strings
    for f in post_decode:
        decoded = decoded.where(_filter_to_column(f))

    if q.aggregates:
        aggs = []
        for a in q.aggregates:
            if a.func == "count":
                if a.var == "*":
                    aggs.append(F.count(F.lit(1)).alias(a.alias))
                elif a.distinct:
                    aggs.append(F.countDistinct(a.var).alias(a.alias))
                else:
                    aggs.append(F.count(a.var).alias(a.alias))
                continue
            # numeric aggregates operate on the literal's lexical value
            col = terms.literal_value(F.col(a.var)).cast("double")
            if a.func == "sum":
                aggs.append(F.sum(col).alias(a.alias))
            elif a.func == "avg":
                aggs.append(F.avg(col).alias(a.alias))
            elif a.func == "min":
                aggs.append(F.min(col).alias(a.alias))
            elif a.func == "max":
                aggs.append(F.max(col).alias(a.alias))
            elif a.func == "sample":
                aggs.append(F.first(F.col(a.var)).alias(a.alias))
            elif a.func == "group_concat":
                aggs.append(F.concat_ws(" ", F.collect_list(F.col(a.var))).alias(a.alias))
        grouped = decoded.groupBy(*q.group_by) if q.group_by else decoded.groupBy()
        decoded = grouped.agg(*aggs)
        # HAVING: comparisons over aggregate aliases (already-numeric
        # columns — not term strings, so not _filter_to_column's job)
        for h in q.having:
            hm = re.match(r"^\s*\?(\w+)\s*(=|!=|<=|>=|<|>)\s*([+-]?\d+(?:\.\d+)?)\s*$", h)
            if not hm:
                raise ValueError(f"unsupported HAVING expression: {h!r}")
            lhs = F.col(hm.group(1))
            rv = F.lit(float(hm.group(3)))
            decoded = decoded.where(
                {
                    "=": lhs == rv, "!=": lhs != rv, "<": lhs < rv,
                    "<=": lhs <= rv, ">": lhs > rv, ">=": lhs >= rv,
                }[hm.group(2)]
            )
        proj = (q.variables or q.group_by) + [a.alias for a in q.aggregates]
        decoded = decoded.select(*proj)
    else:
        proj = q.variables or var_cols
        decoded = decoded.select(*proj)

    if q.distinct:
        decoded = decoded.dropDuplicates()
    if q.order_by:
        decoded = decoded.orderBy(
            *[F.col(v).desc() if desc else F.col(v).asc() for v, desc in q.order_by]
        )
    if q.offset:
        decoded = decoded.offset(q.offset)
    if q.limit is not None:
        decoded = decoded.limit(q.limit)
    return decoded


def sparql_select(kg: KnowledgeGraph, query: str) -> DataFrame:
    """Parse + execute a SPARQL-lite SELECT/ASK; string-term columns."""
    q = parse_sparql(query)
    result = execute(kg, q)
    if q.ask:
        spark = result.sparkSession
        has = result.limit(1).count() > 0
        return spark.createDataFrame([(has,)], ["bool"])
    return result


_CONSTRUCT_RE = re.compile(r"CONSTRUCT\s*\{", re.I)


def sparql_construct(kg: KnowledgeGraph, query: str) -> DataFrame:
    """CONSTRUCT { template } WHERE { BGP … } → (s, p, o) string triples.

    The reference gets CONSTRUCT from oxigraph and serializes via
    oxrdfio (src/query.rs:155-175); here the template is instantiated
    per solution with a select per template triple + union + distinct
    (CONSTRUCT produces a graph, i.e. a triple SET).
    """
    m = _CONSTRUCT_RE.search(query)
    if not m:
        raise ValueError("not a CONSTRUCT query")
    # template block: first {...} after CONSTRUCT
    start = m.end() - 1
    depth = 0
    end = start
    for i in range(start, len(query)):
        if query[i] == "{":
            depth += 1
        elif query[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    template_text = query[start + 1 : end]
    q = _strip_comments(query)
    prefixes = {pm.group(1): pm.group(2) for pm in _PREFIX_RE.finditer(q)}
    template = _parse_bgp(_strip_comments(template_text), prefixes)

    # rewrite as a SELECT * over the WHERE clause
    select_query = "\n".join(
        pm.group(0) for pm in _PREFIX_RE.finditer(query)
    ) + "\nSELECT * " + query[end + 1 :]
    sols = sparql_select(kg, select_query)

    parts = []
    for t in template:
        cols = []
        for pos_name, term in (("s", t.s), ("p", t.p), ("o", t.o)):
            if term.startswith("?"):
                cols.append(F.col(term[1:]).alias(pos_name))
            else:
                cols.append(F.lit(term).alias(pos_name))
        parts.append(sols.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


_DESCRIBE_RE = re.compile(r"DESCRIBE\s+([^{]*?)\s*(?:WHERE\s*)?(\{|$)", re.I | re.S)


def sparql_describe(kg: KnowledgeGraph, query: str) -> DataFrame:
    """DESCRIBE <iri>… | DESCRIBE ?v… WHERE { … } → (s, p, o) triples.

    Description semantics: all triples whose SUBJECT is a described
    resource (the simple/outgoing description oxigraph produces; the
    reference routes DESCRIBE results through the same graph
    serializers as CONSTRUCT — src/query.rs:102-176 matches
    ``QueryResults::Graph`` for both forms).

    The described set is resolved in uid space: constants and solution
    bindings become a tiny uid table broadcast-semi-joined against the
    triples' s_id — only the matching triples ever decode to strings.
    """
    q = _strip_comments(query)
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_RE.finditer(q)}
    m = _DESCRIBE_RE.search(q)
    if not m:
        raise ValueError("not a DESCRIBE query")
    targets = [t for t in re.findall(r"\?\w+|<[^>]*>|[A-Za-z_][\w-]*:[\w.-]*", m.group(1))]
    if not targets:
        raise ValueError("DESCRIBE needs at least one variable or IRI")
    variables = [t[1:] for t in targets if t.startswith("?")]
    consts = [_resolve_term(t, prefixes) for t in targets if not t.startswith("?")]

    spark = kg.triples.sparkSession
    term_parts: list[DataFrame] = []
    if consts:
        term_parts.append(spark.createDataFrame([(c,) for c in consts], ["term"]))
    if variables:
        if m.group(2) != "{":
            raise ValueError("DESCRIBE with variables requires a WHERE clause")
        select_query = (
            "\n".join(pm.group(0) for pm in _PREFIX_RE.finditer(q))
            + f"\nSELECT {' '.join('?' + v for v in variables)} "
            + q[m.end() - 1 :]
        )
        sols = sparql_select(kg, select_query)
        for v in variables:
            term_parts.append(sols.select(F.col(v).alias("term")).where(F.col("term").isNotNull()))
    described = term_parts[0]
    for p in term_parts[1:]:
        described = described.unionByName(p)
    uids = kg.term_uids.join(described.distinct(), "term", "left_semi").select(
        F.col("uid").alias("s_id")
    )
    from de_spark.encode import decode_triples

    trip = kg.triples.join(F.broadcast(uids), "s_id", "left_semi")
    return decode_triples(trip, kg.term_uids).select("s", "p", "o").dropDuplicates()
