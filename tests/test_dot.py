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
