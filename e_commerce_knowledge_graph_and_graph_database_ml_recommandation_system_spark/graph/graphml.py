"""GraphML export + scan (SURVEY §2.1 S3) — interop with the reference's
persistence format (``knowledge_graph_creation.py:243``: nx.write_graphml;
read side ``knn_similarity.py:97`` / ``xgboost_training_for_big_data.py:142``:
nx.read_graphml).

The graph lives in Parquet; GraphML is an interop boundary. Node/edge XML
fragments are rendered per-partition (distributed, no driver row loop);
the driver stitches header + fragments + footer. At 100 TB you'd write the
fragments as text files and cat them at the consumer — this local writer
collects only because GraphML itself is a single-file format. The SCAN is
fully distributed: spark.read.text splits the file across partitions and
every element parses with regexp expressions (line-oriented GraphML, which
is what both this exporter and networkx emit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# XML entity escaping, applied exporter-side and inverted scanner-side.
# Order matters: '&' first on escape, '&amp;' last on unescape.
_ENTITIES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]


def _esc(c):
    col = F.col(c) if isinstance(c, str) else c
    for raw, ent in _ENTITIES:
        col = F.replace(col, F.lit(raw), F.lit(ent))
    return col


def _unesc(col):
    for raw, ent in reversed(_ENTITIES):
        col = F.replace(col, F.lit(ent), F.lit(raw))
    return col

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="label" for="node" attr.name="label" attr.type="string"/>\n'
    '  <key id="dvid" for="node" attr.name="dvid" attr.type="int"/>\n'
    '  <key id="type" for="edge" attr.name="type" attr.type="string"/>\n'
    '  <graph id="G" edgedefault="directed">\n'
)
_FOOTER = "  </graph>\n</graphml>\n"


def _node_xml(df: DataFrame) -> DataFrame:
    return df.select(
        F.format_string(
            '    <node id="%s"><data key="label">%s</data><data key="dvid">%s</data></node>',
            _esc("id"),
            _esc("label"),
            F.col("dvid").cast("string"),
        ).alias("xml")
    )


def _edge_xml(df: DataFrame) -> DataFrame:
    return df.select(
        F.format_string(
            '    <edge source="%s" target="%s"><data key="type">%s</data></edge>',
            _esc("src"),
            _esc("dst"),
            _esc("type"),
        ).alias("xml")
    )


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> int:
    """Write a GraphML file; returns element count.

    Scale shape: XML fragments render executor-side and are written as
    DISTRIBUTED text part-files (no collect — rows never materialize on the
    driver); the driver then streams header + fragments + footer into the
    single output file GraphML requires. Fragments are read back through
    ``spark.read.text(...).toLocalIterator()`` — codec-agnostic (a session
    compression codec or nonstandard committer output would corrupt a raw
    ``part-*`` glob) and still O(1) driver memory, one partition in flight.
    Nodes are concatenated before edges so element order matches networkx
    expectations for single-pass consumers."""
    import shutil
    import tempfile

    count = 0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(_HEADER)
        for frag_df in (_node_xml(nodes), _edge_xml(edges)):
            spark = frag_df.sparkSession
            tmp = tempfile.mkdtemp(prefix="graphml_frag_")
            frag_dir = f"{tmp}/parts"
            try:
                frag_df.write.mode("overwrite").text(frag_dir)
                for row in spark.read.text(frag_dir).toLocalIterator():
                    fh.write(row[0])
                    fh.write("\n")
                    count += 1
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        fh.write(_FOOTER)
    return count


def read_graphml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S3 scan: parse a line-oriented GraphML file back to
    (nodes(id, label, dvid), edges(src, dst, type)) DataFrames.

    Distributed: the text source splits the file into partitions and every
    element parses via regexp expressions in whole-stage codegen — no
    driver-side DOM, no Python loop. ``<data key="...">`` values carry
    through XML-unescape; a missing dvid parses to NULL (try_cast, ANSI
    mode never throws on foreign files). Roundtrips export_graphml
    bit-exactly and reads networkx-style single-line elements."""
    lines = spark.read.text(path)
    nodes = (
        lines.filter(F.col("value").rlike("<node[ >]"))
        .select(
            _unesc(F.regexp_extract("value", 'id="([^"]*)"', 1)).alias("id"),
            _unesc(F.regexp_extract("value", '<data key="label">([^<]*)</data>', 1)).alias("label"),
            F.regexp_extract("value", '<data key="dvid">([^<]*)</data>', 1).try_cast("int").alias("dvid"),
        )
    )
    edges = (
        lines.filter(F.col("value").rlike("<edge[ >]"))
        .select(
            _unesc(F.regexp_extract("value", 'source="([^"]*)"', 1)).alias("src"),
            _unesc(F.regexp_extract("value", 'target="([^"]*)"', 1)).alias("dst"),
            _unesc(F.regexp_extract("value", '<data key="type">([^<]*)</data>', 1)).alias("type"),
        )
    )
    return nodes, edges
