"""PySpark-native analytics engine re-expressing the query and
data-processing capabilities of MaartenLangen/PangenomesAsGraphDatabases.

The reference builds a pangenome *labeled property graph* in Neo4j and
queries it with Cypher + pandas post-processing.  This engine represents
the graph as vertex/edge DataFrames and expresses every reference
operator (SURVEY.md section 2) as idiomatic Spark DataFrame/SQL plans,
plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, streaming).
"""

__version__ = "0.1.0"
