"""Freeze-check the per-template kernel constants that back the driver's
SQL oracle for triple extraction (ops/kgdocs.py). If the kernel's
semantics change, this fails BEFORE the driver's oracle does, pointing at
the constant table to regenerate."""

from __future__ import annotations

from propertygraph_spark.kernel.extract import extract_document
from propertygraph_spark.ops.kgdocs import (JAVA_TEMPLATES,
                                            TEMPLATE_MENTION_COUNTS,
                                            TEMPLATE_TRIPLE_COUNTS)


def test_template_constants():
    for tpl, template in enumerate(JAVA_TEMPLATES):
        _, triples, mentions, err = extract_document("t", template % 7)
        assert err is None
        by_pred: dict = {}
        for t in triples:
            by_pred[t["pred"]] = by_pred.get(t["pred"], 0) + 1
        assert by_pred == TEMPLATE_TRIPLE_COUNTS[tpl], f"template {tpl}"
        by_kind: dict = {}
        for m in mentions:
            by_kind[m["kind"]] = by_kind.get(m["kind"], 0) + 1
        assert by_kind == TEMPLATE_MENTION_COUNTS[tpl], f"template {tpl}"


def test_template_shape_independent_of_literal():
    """The embedded doc_id literal must not change graph shape — the
    whole oracle construction rests on this."""
    for template in JAVA_TEMPLATES:
        base = None
        for value in (0, 7, 123456789):
            _, triples, _, err = extract_document("t", template % value)
            assert err is None
            counts: dict = {}
            for t in triples:
                counts[t["pred"]] = counts.get(t["pred"], 0) + 1
            if base is None:
                base = counts
            else:
                assert counts == base


def test_all_nine_predicates_covered():
    preds = set()
    for tpl in TEMPLATE_TRIPLE_COUNTS.values():
        preds |= set(tpl)
    assert preds == {"ast_child", "cfg_normal", "cfg_true", "cfg_false",
                     "cfg_jump", "pdg_control_true", "pdg_control_false",
                     "pdg_data", "pdg_execution"}


def test_ext_template_constants_and_shape_independence():
    """r5 kernel-shape templates (switch fall-through + labeled break,
    do-while + continue, synchronized, anonymous class + lambda): the
    frozen EXT_SHAPE_COUNTS match a fresh kernel run, the embedded
    literal never changes the shape, and each template actually
    produces the construct's signature edges."""
    from propertygraph_spark.ops.kgdocs import (EXT_SHAPE_COUNTS,
                                                JAVA_TEMPLATES_EXT)
    for tpl, template in enumerate(JAVA_TEMPLATES_EXT):
        base = None
        for value in (0, 7, 987654321):
            _, triples, mentions, err = extract_document(
                "t", template % value)
            assert err is None, (tpl, err)
            counts: dict = {}
            for t in triples:
                counts[t["pred"]] = counts.get(t["pred"], 0) + 1
            for m in mentions:
                key = f"mention:{m['kind']}"
                counts[key] = counts.get(key, 0) + 1
            if base is None:
                base = counts
                assert counts == EXT_SHAPE_COUNTS[tpl], f"ext {tpl}"
            else:
                assert counts == base, f"ext {tpl} literal-dependent"
    # signature edges: labeled break + fall-through switch jumps (E0),
    # do-while loop-back/continue jump (E1), both with real branch edges
    assert EXT_SHAPE_COUNTS[0]["cfg_jump"] >= 2
    assert EXT_SHAPE_COUNTS[1]["cfg_jump"] >= 1
    assert all("cfg_true" in c for c in EXT_SHAPE_COUNTS.values()
               if c is not EXT_SHAPE_COUNTS[3])
    # r5 widening: labeled continue jump (E6); every new template (E4-E7)
    # carries real branch edges
    assert len(EXT_SHAPE_COUNTS) == 8
    assert EXT_SHAPE_COUNTS[6]["cfg_jump"] >= 1
    for tpl in (4, 5, 6, 7):
        assert EXT_SHAPE_COUNTS[tpl]["cfg_true"] >= 1, tpl


def test_error_drop_constants():
    """Graceful-drop corpus invariants: the valid template produces rows
    and no error; the truncated one exactly ONE digit-normalized error
    row and nothing else; prose produces nothing at all (reference
    silent-drop semantics for unit-less sources)."""
    from propertygraph_spark.ops.kgdocs import ERROR_DROP_COUNTS
    assert len(ERROR_DROP_COUNTS) == 3
    valid = ERROR_DROP_COUNTS[0]
    assert valid.get("node", 0) > 0
    assert not any(k.startswith("error:") for k in valid)
    broken = ERROR_DROP_COUNTS[1]
    assert list(broken.values()) == [1]
    (key,) = broken.keys()
    assert key.startswith("error:") and "N" in key  # digits normalized
    assert ERROR_DROP_COUNTS[2] == {}


def test_cfg_scc_and_dominator_constants_pinned():
    """The r5 loop/dominator profile of the four main templates, pinned
    literally: templates 1 and 3 carry a loop construct (for / while)
    so their CFGs must contain exactly one multi-node SCC; 0 and 2 are
    loop-free (every SCC a singleton). Dominator-tree edge counts and
    depths are pinned to catch any kernel CFG drift."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_CFG_DOM,
                                                TEMPLATE_CFG_SCC)
    assert TEMPLATE_CFG_SCC == {0: (4, 0, 1), 1: (7, 1, 3),
                                2: (6, 0, 1), 3: (6, 1, 4)}
    assert TEMPLATE_CFG_DOM == {0: (3, 2), 1: (8, 7),
                                2: (3, 3), 3: (8, 6)}


def test_cyclomatic_constants_pinned():
    """McCabe complexity of the four main templates, pinned literally:
    each contributes exactly one method; the if-bearing templates 0/1
    score M = 2, the branch-free try/catch template 2 scores 1, and
    the while + nested-if template 3 scores 3 (M = E - N + 2 over the
    distinct cfg_* edge set)."""
    from propertygraph_spark.ops.kgdocs import TEMPLATE_CFG_CYCLOMATIC
    assert TEMPLATE_CFG_CYCLOMATIC == {0: (1, 2, 2), 1: (1, 2, 2),
                                       2: (1, 1, 1), 3: (1, 3, 3)}


def test_api_pagerank_oracle_is_exact_integer_replay():
    """The corpus call graph is a pure function of the template set, so
    the oracle inlines host-replayed integer PageRank ranks. Pin the
    structural invariants: the four caller classes D0-D3 have no
    in-edges, so after any iteration their rank is exactly the base
    term 150000 (unit * 0.15); every linked callee accumulates more."""
    import re
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_LINK_OCCURRENCES,
                                                _host_best_link,
                                                api_pagerank_oracle_sql)
    from propertygraph_spark.pipeline.linking import symbol_rows
    rows = symbol_rows()
    expected_callers = {
        f"D{tpl}" for tpl, occs in TEMPLATE_LINK_OCCURRENCES.items()
        if any(k == "call_site" and _host_best_link(m, c, rows)
               for m, k, c in occs)}
    sql = api_pagerank_oracle_sql()
    ranks = dict(re.findall(r"\('([^']+)', (\d+)\)", sql))
    callers = {n for n in ranks if re.fullmatch(r"D\d", n)}
    assert callers == expected_callers and len(callers) >= 3
    assert all(int(ranks[c]) == 150000 for c in callers)
    callees = {n: int(r) for n, r in ranks.items() if n not in callers}
    assert callees and all(r > 150000 for r in callees.values())


def test_backward_slice_constants_pinned():
    """Weiser backward slices of the four templates' single Return,
    pinned literally: data+control closure reaches 7/11/6/11 nodes
    (incl. the return) — the loop templates 1/3 pull in the loop
    condition and its dependence cone, the straight-line template 2
    the least."""
    from propertygraph_spark.ops.kgdocs import TEMPLATE_PDG_SLICE
    assert TEMPLATE_PDG_SLICE == {0: (1, 7, 7), 1: (1, 11, 11),
                                  2: (1, 6, 6), 3: (1, 11, 11)}


def test_forward_slice_constants_pinned():
    """Forward slices from the four templates' two parameters each,
    pinned literally: the dependence cones REACHED FROM (a, b) — the
    loop templates 1/3 propagate a parameter through the loop
    condition into more of the method body (max 7), the straight-line
    templates stop at 5."""
    from propertygraph_spark.ops.kgdocs import TEMPLATE_PDG_FSLICE
    assert TEMPLATE_PDG_FSLICE == {0: (2, 9, 5), 1: (2, 8, 7),
                                   2: (2, 7, 5), 3: (2, 12, 7)}


def test_closeness_constants_pinned():
    """Integer out-closeness over the four templates' CFGs, pinned
    literally: (n_cfg_nodes, sum_closeness_ppm, max_closeness_ppm) —
    template 0's 4-node CFG peaks at the 666666 ppm of a 3-hop chain
    head; the loop templates dilute per-node reach (max 281250 /
    347222) because back edges lengthen the average path."""
    from propertygraph_spark.ops.kgdocs import TEMPLATE_CFG_CLOSENESS
    assert TEMPLATE_CFG_CLOSENESS == {0: (4, 1599999, 666666),
                                      1: (9, 1891846, 281250),
                                      2: (6, 1233332, 300000),
                                      3: (9, 2188993, 347222)}


def test_clone2_constants_pinned():
    """Type-2 clone freeze: one method per template doc, raw keys
    distinct per doc (the embedded literal), and two different
    instantiations collapse to ONE normalized clone group."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_CLONE2,
                                                _norm_clone_tokens)
    assert TEMPLATE_CLONE2 == {0: (1, 1, 1), 1: (1, 1, 1),
                               2: (1, 1, 1), 3: (1, 1, 1)}
    # the normalization itself: literals -> '#', keywords kept,
    # identifiers -> '$', non-word runs are separators
    assert _norm_clone_tokens("int total = foo(42, bar);") \
        == "int $ $ # $"
    assert _norm_clone_tokens("") == ""


def test_betweenness_constants_pinned():
    """Stress + floored-betweenness freeze (explicit shortest-path
    enumeration replay): (n_cfg_nodes, sum_stress, max_stress,
    sum_bc_fppm) per template. The straight-line template 0 has two
    interior brokers at stress 1+... = 2; the loop templates (1, 3)
    concentrate traffic on the loop head/condition (max 18 / 22). On
    these CFGs every pair has a UNIQUE shortest path, so sum_bc_fppm
    == 1e6 * sum_stress — the diamond case where they diverge is
    pinned in test_ops_spark's hand graphs."""
    from propertygraph_spark.ops.kgdocs import TEMPLATE_CFG_BETWEENNESS
    assert TEMPLATE_CFG_BETWEENNESS == {
        0: (4, 2, 2, 2_000_000),
        1: (9, 76, 18, 76_000_000),
        2: (6, 5, 2, 5_000_000),
        3: (9, 68, 22, 68_000_000)}


def test_halstead_constants_and_literal_collision_pinned():
    """Halstead freeze: per-template (n_methods, n1, n2, N1, N2,
    volume, difficulty_milli) — and the SPECIAL doc_id=1 case, the
    only doc whose injected literal can collide with a template
    literal ("1" in template 1's loop increment): its distinct
    operand count drops from 9 to 8 and difficulty rises 3500 ->
    3937, which the oracle folds in per present special doc."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_HALSTEAD,
                                                TEMPLATE_HALSTEAD_SPECIAL)
    assert TEMPLATE_HALSTEAD == {
        0: (1, 4, 5, 4, 9, 39, 3600),
        1: (1, 3, 9, 7, 21, 84, 3500),
        2: (1, 2, 9, 3, 15, 54, 1666),
        3: (1, 4, 9, 8, 20, 84, 4444)}
    # doc 0's literal "0" does NOT appear in template 0 -> identical
    assert TEMPLATE_HALSTEAD_SPECIAL[0] == TEMPLATE_HALSTEAD[0]
    # doc 1's literal "1" collides with template 1's "i = i + 1"
    assert TEMPLATE_HALSTEAD_SPECIAL[1] == (1, 3, 8, 7, 21, 84, 3937)
