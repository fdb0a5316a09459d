"""RDF graph serializations for CONSTRUCT/DESCRIBE-style output
(reference S10, src/query.rs:155-175 via oxrdfio).

N-Triples is the primary sink (de_spark.sources.nt.write_nt); here are
the remaining row-renderable formats.  All are pure column renders —
distributed text writes, no driver materialization.  Pretty-printed
Turtle with prefix blocks is P2 (it needs global prefix agreement);
this module emits the line-oriented subset every RDF parser accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_spark import terms


def _term(col):
    return terms.ntriples_form(col)


def render_ntriples(triples_raw: DataFrame) -> DataFrame:
    """(s,p,o) → one NT line per row, column ``line``."""
    return triples_raw.select(
        F.concat(
            _term(F.col("s")), F.lit(" "), _term(F.col("p")), F.lit(" "),
            _term(F.col("o")), F.lit(" ."),
        ).alias("line")
    )


def render_nquads(triples_raw: DataFrame) -> DataFrame:
    """(s,p,o,graph) → N-Quads lines (graph as the 4th term)."""
    return triples_raw.select(
        F.concat(
            _term(F.col("s")), F.lit(" "), _term(F.col("p")), F.lit(" "),
            _term(F.col("o")), F.lit(" "), _term(F.col("graph")), F.lit(" ."),
        ).alias("line")
    )


def render_turtle_lines(triples_raw: DataFrame) -> DataFrame:
    """Subject-grouped Turtle: one ``<s> <p1> o1 ; <p2> o2 .`` statement
    per subject.  Grouping is a single aggregation; predicate-object
    pairs are sorted for determinism."""
    po = F.concat(_term(F.col("p")), F.lit(" "), _term(F.col("o")))
    return (
        triples_raw.groupBy("s")
        .agg(F.array_sort(F.collect_list(po)).alias("pos"))
        .select(
            F.concat(
                _term(F.col("s")), F.lit(" "),
                F.array_join(F.col("pos"), " ;\n    "), F.lit(" ."),
            ).alias("line")
        )
    )


def write_rdf(triples_raw: DataFrame, path: str, fmt: str = "nt") -> None:
    renderers = {
        "nt": render_ntriples,
        "ntriples": render_ntriples,
        "nq": render_nquads,
        "nquads": render_nquads,
        "ttl": render_turtle_lines,
        "turtle": render_turtle_lines,
    }
    try:
        render = renderers[fmt]
    except KeyError:
        raise ValueError(f"unsupported RDF output format: {fmt!r}") from None
    render(triples_raw).write.mode("overwrite").text(path)
