"""DOT sink format tests: cluster scheme, node shapes, edge styles —
the reference's SaveCFG/SavePDG/SaveAST surface (pipeline/dot.py)."""

from __future__ import annotations

import pytest

from propertygraph_spark.pipeline.dot import ast_dot, cfg_dot, pdg_dot
from propertygraph_spark.pipeline.extract import extract_docs, split_union
from propertygraph_spark.pipeline.fixtures import DOCS_SCHEMA

SRC = ("class A { int m(int a) { if (a > 0) { a = a - 1; } "
       "return a; } }")


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.createDataFrame([("d1", [("code", SRC, "", 0)])], DOCS_SCHEMA)
    union = extract_docs(docs, route=False)
    nodes, triples, _, errors = split_union(union)
    assert errors.count() == 0
    return nodes.cache(), triples.cache()


def test_cfg_dot_format(tables):
    nodes, triples = tables
    dot = cfg_dot(nodes, triples, "d1")
    assert dot.startswith("digraph CFG {") and dot.endswith("}")
    assert "subgraph cluster0 {" in dot
    assert 'label = "m <1...1>"' in dot
    # the if-condition renders as a diamond with true/false edges
    assert "shape = diamond" in dot
    assert 'label = "true"' in dot and 'label = "false"' in dot
    assert 'if  ( a > 0 )' in dot  # reference text rendering


def test_pdg_dot_format(tables):
    nodes, triples = tables
    dot = pdg_dot(nodes, triples, "d1")
    assert "digraph PDG {" in dot
    assert "style = bold" in dot      # execution edges
    assert "style = dotted" in dot    # control edges
    assert 'label = "a"' in dot       # data edge labeled with the variable
    assert "shape = box" in dot       # parameter node
    assert '"Enter' in dot or "Enter" in dot


def test_ast_dot_format(tables):
    nodes, triples = tables
    dot = ast_dot(nodes, triples, "d1")
    assert "digraph AST {" in dot
    # identity-tuple labels: (content,Category,startLine,endLine)
    assert ",Method,1,1)" in dot
    assert '" -> "' in dot


# ------------------------------------------------ frozen golden DOT files

import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_dot")
FIXTURE = "FilenameGuardFilterOld.java"


@pytest.fixture(scope="module")
def fixture_tables(spark):
    with open(f"/root/reference/testcase/{FIXTURE}") as f:
        src = f.read()
    docs = spark.createDataFrame([(FIXTURE, [("code", src, "", 0)])],
                                 DOCS_SCHEMA)
    union = extract_docs(docs, route=False)
    nodes, triples, _, errors = split_union(union)
    assert errors.count() == 0
    return nodes.cache(), triples.cache()


@pytest.mark.parametrize("kind,fmt", [("ast", ast_dot), ("cfg", cfg_dot),
                                      ("pdg", pdg_dot)])
def test_golden_dot_byte_identical(fixture_tables, kind, fmt):
    """One frozen DOT per graph kind for the PARITY.md hand-verified
    fixture — the full sink output (cluster scheme Common.java:23-35,
    node/edge grammar SaveCFG.java:70-170, SavePDG.java:72-149,
    ASTtoDOT.java:42-46) is byte-stable, not just smoke-valid. The CFG
    golden encodes exactly the 4 hand-verified edges of PARITY.md."""
    nodes, triples = fixture_tables
    got = fmt(nodes, triples, FIXTURE) + "\n"
    with open(os.path.join(GOLDEN_DIR, f"FilenameGuardFilterOld_{kind}.dot")) as f:
        want = f.read()
    assert got == want


def test_ntriples_sink_escapes_and_counts(spark, tmp_path):
    """write_ntriples: one well-formed line per edge, path-like doc ids
    and variable labels percent-encoded into valid IRIs, qualifier
    label only on pdg_data predicates, and the returned count matches
    the shard contents."""
    import glob

    from propertygraph_spark.pipeline.ntriples import (ntriples_lines,
                                                       write_ntriples)
    triples = spark.createDataFrame(
        [("a/b c.java", 1, "ast_child", 2, ""),
         ("a/b c.java", 3, "pdg_data", 4, "my var")],
        "doc_id string, subj long, pred string, obj long, label string")
    lines = sorted(r["line"] for r in ntriples_lines(triples).collect())
    assert lines == [
        "<pg:n/a%2Fb+c.java/1> <pg:p/ast_child> <pg:n/a%2Fb+c.java/2> .",
        "<pg:n/a%2Fb+c.java/3> <pg:p/pdg_data#my+var> "
        "<pg:n/a%2Fb+c.java/4> .",
    ]
    out = str(tmp_path / "nt")
    n = write_ntriples(triples, out)
    assert n == 2
    on_disk = []
    for f in glob.glob(f"{out}/part-*"):
        with open(f) as fh:
            on_disk += [ln.rstrip("\n") for ln in fh if ln.strip()]
    assert sorted(on_disk) == lines
