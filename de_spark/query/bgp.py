"""Basic-graph-pattern compiler: triple patterns → DataFrame join chain.

The reference gets BGP evaluation from oxigraph's spareval, which probes
the single physical access path per pattern with bindings substituted
(index nested loop, src/sparql.rs:419-489).  Spark-first restatement:
each pattern is a filtered view of the uid-encoded triples table; shared
variables become integer equi-join keys; Catalyst + AQE pick
broadcast/sort-merge/skew handling per join.

Pattern ordering (SURVEY.md §4 P7): patterns are compiled
most-selective-first — more bound positions first, predicate-bound
before object-bound before subject-bound among equals — the classic
SPARQL BGP heuristic.  This only sets the initial join order; AQE may
still re-plan at runtime.

Variables join on global term uids, so subject/object/predicate
positions are directly comparable (same term string ⇒ same uid; see
de_spark.dictionary docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_spark.graph import KnowledgeGraph


@dataclass(frozen=True)
class TriplePattern:
    """Each position is '?name' for a variable or an HDT-convention
    constant term string."""

    s: str
    p: str
    o: str

    def vars(self) -> list[str]:
        return [t[1:] for t in (self.s, self.p, self.o) if t.startswith("?")]

    def bound_count(self) -> int:
        return sum(0 if t.startswith("?") else 1 for t in (self.s, self.p, self.o))

    def selectivity_key(self) -> tuple:
        # more bound = earlier; tie-break: bound-p+o most selective shape
        bound = tuple(0 if t.startswith("?") else 1 for t in (self.s, self.p, self.o))
        return (-self.bound_count(), -bound[2], -bound[1], -bound[0])


def _compile_one(kg: KnowledgeGraph, pat: TriplePattern) -> DataFrame:
    """One pattern → DataFrame whose columns are the pattern's variable
    names (uid-valued)."""
    df = kg.pattern(
        s=None if pat.s.startswith("?") else pat.s,
        p=None if pat.p.startswith("?") else pat.p,
        o=None if pat.o.startswith("?") else pat.o,
    )
    cols = []
    seen: dict[str, str] = {}
    for pos, term in (("s_id", pat.s), ("p_id", pat.p), ("o_id", pat.o)):
        if term.startswith("?"):
            v = term[1:]
            if v in seen:
                # repeated variable within one pattern: equality filter
                df = df.where(F.col(pos) == F.col(seen[v]))
            else:
                seen[v] = pos
                cols.append(F.col(pos).alias(v))
    if cols:
        return df.select(*cols)
    # fully bound pattern: contributes the empty binding once if matched
    return df.select(F.lit(1).alias("__exists")).limit(1)


def compile_bgp(kg: KnowledgeGraph, patterns: list[TriplePattern]) -> DataFrame:
    """BGP over the default union graph → DataFrame of uid-valued
    variable columns.

    Ordering: statistics first — patterns with a constant predicate are
    ranked by that predicate's actual triple count from the pred_stats
    table (plan-time lookup), so a hub predicate like rdf:type sinks to
    the end of the join chain; the static bound-position heuristic
    breaks ties and covers stat-less patterns."""
    pred_terms = [p.p for p in patterns if not p.p.startswith("?")]
    cards = kg.predicate_cardinalities(pred_terms)
    big = (max(cards.values()) + 1) if cards else 1

    def key(p: TriplePattern):
        est = cards.get(p.p, big if not p.p.startswith("?") else big * 3)
        # fully-bound or o-bound patterns cut below predicate degree
        if not p.o.startswith("?"):
            est = max(est // 100, 1)
        if not p.s.startswith("?"):
            est = max(est // 100, 1)
        return (est, p.selectivity_key())

    ordered = sorted(patterns, key=key)
    df: DataFrame | None = None
    for pat in ordered:
        part = _compile_one(kg, pat)
        if df is None:
            df = part
            continue
        shared = [c for c in part.columns if c in df.columns and c != "__exists"]
        if shared:
            df = df.join(part, shared, "inner")
        else:
            df = df.crossJoin(part)
    assert df is not None, "empty BGP"
    return df.drop("__exists") if "__exists" in df.columns else df
