"""GraphML export (SURVEY §2.1 S3) — interop with the reference's
persistence format (``knowledge_graph_creation.py:243``: nx.write_graphml).

The graph lives in Parquet; GraphML is an export boundary only. Node/edge
XML fragments are rendered per-partition (distributed, no driver row loop);
the driver stitches header + fragments + footer. At 100 TB you'd write the
fragments as text files and cat them at the consumer — this local writer
collects only because GraphML itself is a single-file format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
            "id",
            "label",
            F.col("dvid").cast("string"),
        ).alias("xml")
    )


def _edge_xml(df: DataFrame) -> DataFrame:
    return df.select(
        F.format_string(
            '    <edge source="%s" target="%s"><data key="type">%s</data></edge>',
            "src",
            "dst",
            "type",
        ).alias("xml")
    )


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> int:
    """Write a GraphML file; returns element count. XML fragments render
    executor-side; ids/labels are XML-escaped via the expression pipeline
    upstream (graph ids here are alphanumeric by construction)."""
    n_xml = _node_xml(nodes)
    e_xml = _edge_xml(edges)
    parts = [r["xml"] for r in n_xml.collect()] + [r["xml"] for r in e_xml.collect()]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(_HEADER)
        fh.write("\n".join(parts))
        fh.write("\n")
        fh.write(_FOOTER)
    return len(parts)
