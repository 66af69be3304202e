"""Golden snapshot over the reference's own fixture corpus
(/root/reference/testcase, the files its tests run —
src/test/java/com/tinypdg/PropertyGraphTest.java:16-21).

Per-fixture triple counts per predicate family, node and mention counts,
frozen from the kernel whose per-rule semantics are proven by the unit
suites (test_cfg_shapes/test_pdg_rules/test_defuse/test_kernel_text
trace SURVEY.md §2.4-2.6 rule by rule). Any kernel change that shifts an
edge family on real-world Java fails here with a precise diff — this is
the regression fence for the P/R >= 0.95 target.
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pytest

from propertygraph_spark.kernel.extract import extract_document

FIXDIR = "/root/reference/testcase"

GOLDEN = {
    "ActiveMQMapMessage.java": {
        "triples": {"ast_child": 55, "cfg_false": 1, "cfg_normal": 4,
                    "cfg_true": 1, "pdg_control_false": 1,
                    "pdg_control_true": 2, "pdg_data": 7,
                    "pdg_execution": 7},
        "nodes": 72, "mentions": 16},
    "AmqpAdvisoryTest.java": {
        # no control statements outside the license header -> no branch
        # edges; straight-line code with many calls
        "triples": {"ast_child": 151, "cfg_normal": 22, "pdg_data": 45,
                    "pdg_execution": 25},
        "nodes": 207, "mentions": 47},
    "BaseDataMarshaller.java": {
        "triples": {"ast_child": 56, "cfg_false": 2, "cfg_normal": 4,
                    "cfg_true": 2, "pdg_control_false": 3,
                    "pdg_control_true": 5, "pdg_data": 32,
                    "pdg_execution": 9},
        "nodes": 79, "mentions": 20},
    "BaseDataStreamMarshallerNew.java": {
        "triples": {"ast_child": 60, "cfg_normal": 3, "cfg_true": 2,
                    "pdg_control_true": 2, "pdg_data": 11,
                    "pdg_execution": 6},
        "nodes": 79, "mentions": 19},
    "BaseDataStreamMarshallerOld.java": {
        "triples": {"ast_child": 50, "cfg_normal": 2, "cfg_true": 1,
                    "pdg_control_true": 1, "pdg_data": 8,
                    "pdg_execution": 4},
        "nodes": 63, "mentions": 16},
    "EdgeOperation.java": {
        "triples": {"ast_child": 46, "cfg_normal": 3, "pdg_data": 8,
                    "pdg_execution": 4},
        "nodes": 58, "mentions": 13},
    "FilenameGuardFilterNew.java": {
        "triples": {"ast_child": 43, "cfg_false": 1, "cfg_normal": 3,
                    "cfg_true": 1, "pdg_control_true": 1, "pdg_data": 11,
                    "pdg_execution": 6},
        "nodes": 54, "mentions": 13},
    "FilenameGuardFilterOld.java": {
        "triples": {"ast_child": 37, "cfg_false": 1, "cfg_normal": 2,
                    "cfg_true": 1, "pdg_control_true": 1, "pdg_data": 8,
                    "pdg_execution": 5},
        "nodes": 46, "mentions": 11},
    "MyTest.java": {
        # only test5 is uncommented (nested-block shadowing)
        "triples": {"ast_child": 47, "cfg_normal": 2, "pdg_data": 3,
                    "pdg_execution": 3},
        "nodes": 56, "mentions": 10},
    "PortfolioPublishServlet.java": {
        "triples": {"ast_child": 217, "cfg_false": 4, "cfg_normal": 18,
                    "cfg_true": 5, "pdg_control_false": 5,
                    "pdg_control_true": 17, "pdg_data": 43,
                    "pdg_execution": 28},
        "nodes": 267, "mentions": 48},
    "SqlInjection.java": {
        "triples": {"ast_child": 137, "cfg_false": 2, "cfg_normal": 16,
                    "cfg_true": 2, "pdg_control_false": 1,
                    "pdg_control_true": 6, "pdg_data": 17,
                    "pdg_execution": 21},
        "nodes": 175, "mentions": 20},
}


def test_all_reference_fixtures_covered():
    names = {os.path.basename(p)
             for p in glob.glob(os.path.join(FIXDIR, "*.java"))}
    assert names == set(GOLDEN)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fixture_golden(name):
    with open(os.path.join(FIXDIR, name), encoding="utf-8") as f:
        src = f.read()
    nodes, triples, mentions, err = extract_document(name, src)
    assert err is None
    got = dict(sorted(Counter(t["pred"] for t in triples).items()))
    assert got == GOLDEN[name]["triples"], name
    assert len(nodes) == GOLDEN[name]["nodes"]
    assert len(mentions) == GOLDEN[name]["mentions"]


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fixture_structural_invariants(name):
    """Cross-family invariants on real-world Java (SURVEY.md §5.3):
    pdg_execution ⊇ CFG topology + Enter edge; dense ids per doc;
    pdg_data endpoints exist."""
    with open(os.path.join(FIXDIR, name), encoding="utf-8") as f:
        src = f.read()
    nodes, triples, _, _ = extract_document(name, src)
    ids = {n["node_id"] for n in nodes}
    for t in triples:
        assert t["subj"] in ids and t["obj"] in ids, t
    cfg = {(t["method_id"], t["subj"], t["obj"]) for t in triples
           if t["pred"].startswith("cfg_")}
    exe = {(t["method_id"], t["subj"], t["obj"]) for t in triples
           if t["pred"] == "pdg_execution"}
    # every CFG edge appears as an execution dependence (plus Enter edges)
    missing = cfg - exe
    assert not missing, missing
    for t in triples:
        if t["pred"] == "pdg_data":
            assert t["label"], t  # data edges always carry the variable
