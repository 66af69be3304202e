"""DOT formatters over the nodes/triples tables — parity with the
reference's sinks (graphToDot/SaveCFG.java:70-170, SavePDG.java:72-149,
SaveAST.java:12-52, cluster scheme Common.java:23-35).

Debug/small-scale only by design: DOT is a per-file artifact for eyeballs;
the production sink is the partitioned Parquet node/edge tables
(SURVEY.md §2.7 O4/O5). ``collect`` happens per document after a doc_id
filter, so the driver never pulls more than one document's graphs.

Node ordinal scheme mirrors SaveCFG.java:95-98: rank of the node id within
the method (TreeMap order == our sorted node_id order).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

from pyspark.sql import DataFrame, functions as F

_CFG_LABEL = {"cfg_normal": "", "cfg_true": "true", "cfg_false": "false",
              "cfg_jump": "jump"}
_PDG_STYLE = {"pdg_control_true": ("dotted", "true"),
              "pdg_control_false": ("dotted", "false"),
              "pdg_execution": ("bold", ""),
              "pdg_data": ("solid", None)}  # None -> label = variable name


def _escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _doc_rows(nodes: DataFrame, triples: DataFrame, doc_id: str, graph: str):
    n = (nodes.filter((F.col("doc_id") == doc_id) & (F.col("graph") == graph))
         .collect())
    t = (triples.filter((F.col("doc_id") == doc_id)
                        & F.col("pred").startswith(graph))
         .collect())
    return n, t


def _clusters(node_rows) -> Dict[str, List]:
    by_method: Dict[str, List] = defaultdict(list)
    for r in node_rows:
        by_method[r["method_id"]].append(r)
    return dict(by_method)


def _method_label(method_id: str, rows) -> str:
    # method_id = '<doc>#<ordinal>:<name>'; cluster label 'name <s...e>'
    name = method_id.split(":", 1)[1] if ":" in method_id else method_id
    method_rows = [r for r in rows if r["kind"] == "method"] or rows
    s = min(r["start_line"] for r in method_rows)
    e = max(r["end_line"] for r in rows)
    return f"{name} <{s}...{e}>"


def cfg_dot(nodes: DataFrame, triples: DataFrame, doc_id: str) -> str:
    """Per-method clusters; diamonds for control nodes, 'true/false/jump'
    edge labels (SaveCFG.java:100-142, CFGEdge label scheme
    cfg/edge/CFGControlEdge.java:26-43)."""
    node_rows, triple_rows = _doc_rows(nodes, triples, doc_id, "cfg")
    out = ["digraph CFG {"]
    for ci, (mid, rows) in enumerate(sorted(_clusters(node_rows).items())):
        rows = sorted(rows, key=lambda r: r["node_id"])
        ordinal = {r["node_id"]: i for i, r in enumerate(rows)}
        out.append(f"subgraph cluster{ci} {{")
        out.append(f'graph [label = "{_escape(_method_label(mid, rows))}"];')
        for r in rows:
            shape = "diamond" if r["kind"] == "control" else "ellipse"
            out.append(
                f'{ci}.{ordinal[r["node_id"]]} [style = filled, '
                f'label = "{_escape(r["text"])} <{r["start_line"]}>", '
                f'shape = {shape}];')
        for t in sorted((t for t in triple_rows if t["method_id"] == mid),
                        key=lambda t: (t["subj"], t["obj"])):
            if t["subj"] not in ordinal or t["obj"] not in ordinal:
                continue
            label = _CFG_LABEL[t["pred"]]
            out.append(
                f'{ci}.{ordinal[t["subj"]]} -> {ci}.{ordinal[t["obj"]]} '
                f'[style = solid, label = "{label}"];')
        out.append("}")
    out.append("}")
    return "\n".join(out)


def pdg_dot(nodes: DataFrame, triples: DataFrame, doc_id: str) -> str:
    """Edge styles: solid+varname (data), dotted+true/false (control),
    bold (execution) — SavePDG.java:104-142."""
    node_rows, triple_rows = _doc_rows(nodes, triples, doc_id, "pdg")
    out = ["digraph PDG {"]
    for ci, (mid, rows) in enumerate(sorted(_clusters(node_rows).items())):
        rows = sorted(rows, key=lambda r: r["node_id"])
        ordinal = {r["node_id"]: i for i, r in enumerate(rows)}
        out.append(f"subgraph cluster{ci} {{")
        out.append(f'graph [label = "{_escape(_method_label(mid, rows))}"];')
        for r in rows:
            shape = ("diamond" if r["kind"] == "control"
                     else "box" if r["kind"] == "parameter" else "ellipse")
            out.append(
                f'{ci}.{ordinal[r["node_id"]]} [style = filled, '
                f'label = "{_escape(r["text"])} <{r["start_line"]}>", '
                f'shape = {shape}];')
        for t in sorted((t for t in triple_rows if t["method_id"] == mid),
                        key=lambda t: (t["subj"], t["obj"], t["pred"])):
            if t["subj"] not in ordinal or t["obj"] not in ordinal:
                continue
            style, label = _PDG_STYLE[t["pred"]]
            if label is None:
                label = t["label"]
            out.append(
                f'{ci}.{ordinal[t["subj"]]} -> {ci}.{ordinal[t["obj"]]} '
                f'[style = {style}, label = "{_escape(label)}"];')
        out.append("}")
    out.append("}")
    return "\n".join(out)


def ast_dot(nodes: DataFrame, triples: DataFrame, doc_id: str) -> str:
    """Node label '(content,Category,startLine,endLine)' — the identity
    tuple of ASTtoDOT.buildLabel (astdemo/ASTtoDOT.java:42-46; ordinals
    replace identity hashes, SURVEY.md §2.2 K1)."""
    node_rows, triple_rows = _doc_rows(nodes, triples, doc_id, "ast")
    out = ["digraph AST {"]
    for ci, (mid, rows) in enumerate(sorted(_clusters(node_rows).items())):
        rows = sorted(rows, key=lambda r: r["node_id"])
        ordinal = {r["node_id"]: i for i, r in enumerate(rows)}
        out.append(f"subgraph cluster{ci} {{")
        out.append(f'graph [label = "{_escape(_method_label(mid, rows))}"];')
        for r in rows:
            label = (f'({r["text"]},{r["category"]},'
                     f'{r["start_line"]},{r["end_line"]})')
            out.append(
                f'"{ci}.{ordinal[r["node_id"]]}" [ label = "{_escape(label)}" '
                f'startLineNumber = {r["start_line"]} '
                f'endLineNumber = {r["end_line"]} ];')
        for t in sorted((t for t in triple_rows if t["method_id"] == mid),
                        key=lambda t: (t["subj"], t["obj"])):
            if t["subj"] not in ordinal or t["obj"] not in ordinal:
                continue
            out.append(f'"{ci}.{ordinal[t["subj"]]}" -> '
                       f'"{ci}.{ordinal[t["obj"]]}";')
        out.append("}")
    out.append("}")
    return "\n".join(out)


FORMATTERS = {"ast": ast_dot, "cfg": cfg_dot, "pdg": pdg_dot}
