"""N-Triples export of the KG edge table — the RDF interchange sink
(W3C N-Triples): one line per (subj, pred, obj) edge,

    <pg:n/{doc}/{subj}> <pg:p/{pred}[#{label}]> <pg:n/{doc}/{obj}> .

Node IRIs are doc-scoped (node ids are per-document preorder ordinals,
unique within a doc — SURVEY.md §1.3), so a line is self-contained; the
qualifier label (the pdg_data variable name) rides the predicate IRI's
fragment, which keeps the export plain triples instead of N-Quads /
reification. doc_id and label are percent-encoded (url_encode) so
path-like CLI doc ids ("a/b.java") cannot break IRI syntax.

The reference's interchange surface is Graphviz DOT per compilation
unit (graphToDot/SaveAST.java:27, SaveCFG.java:46, SavePDG.java:49);
N-Triples is the equivalent KG-native export for the triple table the
north rule materializes. Pure Catalyst (format_string), so the export
is a map-only pass over the edge table — shardable text output with no
shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """(doc_id, subj, pred, obj, label) -> one-column DataFrame of
    N-Triples lines. Deterministic per row; no ordering imposed."""
    enc = F.url_encode(F.col("doc_id"))
    pred_iri = F.concat(
        F.lit("pg:p/"), F.col("pred"),
        F.when(F.col("label") != "",
               F.concat(F.lit("#"), F.url_encode(F.col("label"))))
        .otherwise(F.lit("")))
    return triples.select(
        F.format_string("<pg:n/%s/%d> <%s> <pg:n/%s/%d> .",
                        enc, F.col("subj"), pred_iri, enc, F.col("obj"))
        .alias("line"))


def write_ntriples(triples: DataFrame, path: str) -> int:
    """Shard the N-Triples lines as text files under ``path``; returns
    the line count (one Observation, no second scan)."""
    from pyspark.sql import Observation
    obs = Observation("ntriples_lines")
    lines = ntriples_lines(triples).observe(obs, F.count("*").alias("n"))
    lines.write.mode("overwrite").text(path)
    return int(obs.get["n"])
