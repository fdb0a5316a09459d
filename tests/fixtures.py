"""Reference-parity RDF fixtures, committed as string literals
(SURVEY.md §5: mirrors /root/reference/tests/resources/ fruit corpus)."""

BANANA_NT = """\
<http://example.org/Banana> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/Fruit> .
<http://example.org/Banana> <http://example.org/hasColor> "yellow" .
<http://example.org/Banana> <http://example.org/hasTaste> "sweet" .
<http://example.org/Banana> <http://example.org/hasShape> "curved" .
<http://example.org/Banana> <http://example.org/hasWeight> "120 grams" .
<http://example.org/Banana> <http://example.org/growsIn> <http://example.org/TropicalClimate> .
<http://example.org/Banana> <http://example.org/isEdible> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
<http://example.org/Banana> <http://example.org/hasVitamin> <http://example.org/VitaminB6> .
<http://example.org/Banana> <http://example.org/hasPrice> "$0.50" .
<http://example.org/Banana> <http://example.org/hasOrigin> "Ecuador" .
<http://example.org/Fruit> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2000/01/rdf-schema#Class> .
<http://example.org/Fruit> <http://www.w3.org/2000/01/rdf-schema#label> "Fruit" .
"""

APPLE_TTL = """\
@prefix ex: <http://example.org/>.
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>.
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#>.

ex:Apple rdf:type ex:Fruit;
  rdfs:label "Apple";
  ex:variety "Red Delicious";
  ex:hasColor "Red";
  ex:weight "150 grams";
  ex:origin "United States";
  ex:isOrganic true.

ex:Fruit rdf:type rdfs:Class;
  rdfs:label "Fruit".
"""

PINEAPPLE_TTL = """\
@prefix ex: <http://example.org/>.
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>.
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#>.

ex:Pineapple rdf:type ex:Fruit ;
             ex:hasColor "yellow" ;
             ex:hasTaste "sweet" ;
             ex:hasShape "oblong" ;
             ex:hasWeight "500 grams" ;
             ex:growsIn ex:TropicalClimate ;
             ex:isEdible true ;
             ex:hasVitamin ex:VitaminC ;
             ex:hasPrice "$2.50" ;
             ex:hasOrigin "Hawaii" .

ex:Fruit rdf:type rdfs:Class;
             rdfs:label "Fruit".
"""

# apple.ttl re-expressed in RDF/XML (typed node + rdf:Description +
# rdf:resource + rdf:datatype) — must parse to the SAME triple set
APPLE_RDFXML = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:ex="http://example.org/">
  <ex:Fruit rdf:about="http://example.org/Apple">
    <rdfs:label>Apple</rdfs:label>
    <ex:variety>Red Delicious</ex:variety>
    <ex:hasColor>Red</ex:hasColor>
    <ex:weight>150 grams</ex:weight>
    <ex:origin>United States</ex:origin>
    <ex:isOrganic rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</ex:isOrganic>
  </ex:Fruit>
  <rdf:Description rdf:about="http://example.org/Fruit">
    <rdf:type rdf:resource="http://www.w3.org/2000/01/rdf-schema#Class"/>
    <rdfs:label>Fruit</rdfs:label>
  </rdf:Description>
</rdf:RDF>
"""

# TriG: named-graph blocks demote to plain triples (with a warning)
FRUIT_TRIG = """\
@prefix ex: <http://example.org/>.
GRAPH ex:g1 { ex:Apple ex:hasColor "Red" . }
GRAPH <http://example.org/g2> {
  ex:Banana ex:hasColor "yellow" ;
            a ex:Fruit .
}
ex:Cherry ex:hasColor "red" .
"""

# N-Quads: 4th (graph) term demoted
FRUIT_NQ = """\
<http://example.org/A> <http://example.org/p> "x" <http://example.org/g> .
<http://example.org/A> <http://example.org/p> <http://example.org/B> .
"""

QUERY_COLOR_RQ = """\
PREFIX ex: <http://example.org/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

SELECT ?fruit
WHERE {
  ?fruit rdf:type ex:Fruit ;
         ex:hasColor "yellow" .
}

ORDER BY DESC(?fruit)
"""

QUERY_FRUIT_COLOR_RQ = """\
PREFIX ex: <http://example.org/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

SELECT ?fruit ?color
WHERE {
  ?fruit ex:hasColor ?color
}

ORDER BY DESC(?fruit)
"""

ALL_RQ = """\
# Get a list of everything from the RDF.

SELECT DISTINCT ?a ?prop ?c
WHERE {
  ?a ?prop ?c
}
"""
