"""CFG construction rules, one test per shape row of SURVEY.md §2.5
(reference: /root/reference/src/main/java/com/tinypdg/cfg/CFG.java)."""

from conftest import edge_set, wrap


def cfg(src):
    return edge_set(src, "cfg")


def test_sequence():
    e = cfg(wrap("g();\n        h();"))
    assert ("g();", "cfg_normal", "h();", "") in e
    assert len(e) == 1


def test_if_no_else():
    e = cfg(wrap("if (x > 0) { g(); }\n        h();"))
    assert ("if  ( x > 0 )", "cfg_true", "g();", "") in e
    # no-else if: the condition exits false-ward (CFG.java:344-346 + makeEdge)
    assert ("if  ( x > 0 )", "cfg_false", "h();", "") in e
    assert ("g();", "cfg_normal", "h();", "") in e
    assert len(e) == 3


def test_if_else():
    e = cfg(wrap("if (x > 0) { g(); } else { h(); }\n        k();"))
    assert ("if  ( x > 0 )", "cfg_true", "g();", "") in e
    assert ("if  ( x > 0 )", "cfg_false", "h();", "") in e
    assert ("g();", "cfg_normal", "k();", "") in e
    assert ("h();", "cfg_normal", "k();", "") in e
    assert len(e) == 4


def test_while_loop():
    e = cfg(wrap("while (x > 0) { g(); }\n        h();"))
    assert ("while  ( x > 0 )", "cfg_true", "g();", "") in e
    assert ("g();", "cfg_normal", "while  ( x > 0 )", "") in e  # loop back
    assert ("while  ( x > 0 )", "cfg_false", "h();", "") in e   # exit false-ward
    assert len(e) == 3


def test_do_loop():
    e = cfg(wrap("do { g(); } while (x > 0);\n        h();"))
    assert ("g();", "cfg_normal", "x > 0", "") not in e  # condition text unprefixed
    assert ("g();", "cfg_normal", " ( x > 0 )", "") in e
    assert (" ( x > 0 )", "cfg_true", "g();", "") in e
    assert (" ( x > 0 )", "cfg_false", "h();", "") in e
    assert len(e) == 3


def test_for_loop():
    e = cfg(wrap("for (int i = 0; i < x; i++) { g(); }\n        h();"))
    # initializers chain -> cond; cond -true-> body; body -> updaters -> cond
    assert ("int i = 0", "cfg_normal", " ( i < x )", "") in e
    assert (" ( i < x )", "cfg_true", "g();", "") in e
    assert ("g();", "cfg_normal", "i++", "") in e
    assert ("i++", "cfg_normal", " ( i < x )", "") in e
    assert (" ( i < x )", "cfg_false", "h();", "") in e
    assert len(e) == 5


def test_foreach_pseudo_condition_spliced():
    # Foreach has a null condition -> pseudo node spliced out: body exits
    # loop straight back to body enter (CFG.java:277-318 + :452-489)
    e = cfg(wrap("for (String s : items) { g(); }\n        h();"))
    assert ("g();", "cfg_normal", "g();", "") in e
    assert ("g();", "cfg_normal", "h();", "") in e
    assert len(e) == 2


def test_break_jump_edge():
    e = cfg(wrap("while (x > 0) { if (y > 1) { break; } g(); }\n        h();"))
    # break resolved at the loop: it becomes a loop exit; chaining to the
    # next statement emits a jump edge (CFGJumpEdge, makeEdge from break node)
    assert ("break;", "cfg_jump", "h();", "") in e
    assert ("if  ( y > 1 )", "cfg_true", "break;", "") in e
    # break is NOT looped back to the condition
    assert ("break;", "cfg_normal", "while  ( x > 0 )", "") not in e


def test_continue_jump_edge():
    e = cfg(wrap("while (x > 0) { if (y > 1) { continue; } g(); }\n        h();"))
    assert ("continue;", "cfg_jump", "while  ( x > 0 )", "") in e


def test_labeled_break():
    e = cfg(wrap(
        "outer: while (x > 0) { while (y > 0) { break outer; } }\n        h();"))
    assert ("break outer;", "cfg_jump", "h();", "") in e
    # the labeled break escapes the inner loop entirely
    assert ("break outer;", "cfg_jump", "while  ( y > 0 )", "") not in e


def test_switch_fallthrough_and_break():
    e = cfg(wrap(
        "switch (x) { case 1: g(); case 2: h(); break; default: k(); }\n"
        "        z();"))
    # cond -true-> every case node (CFG.java:377-385)
    assert ("x", "cfg_true", "case 1:", "") in e
    assert ("x", "cfg_true", "case 2:", "") in e
    assert ("x", "cfg_true", ":", "") in e
    # fall-through: g() -> case 2 label; h() -> break; break -jump-> z()
    assert ("g();", "cfg_normal", "case 2:", "") in e
    assert ("h();", "cfg_normal", "break;", "") in e
    assert ("break;", "cfg_jump", "z();", "") in e
    # no fall-through after break into default
    assert ("break;", "cfg_jump", ":", "") not in e
    assert ("break;", "cfg_normal", ":", "") not in e


def test_try_catch_unreachable():
    e = cfg(wrap(
        "try { g(); } catch (Exception ex) { h(); }\n        z();"))
    # NO edge from try body into the catch block (CFG.java:414-447)
    assert not any(s == "g();" and o == "catch ( Exception ex )" for s, _, o, _ in e)
    # catch condition -true-> catch body
    assert ("catch ( Exception ex )", "cfg_true", "h();", "") in e
    # body exit and catch exit both chain to the statement after try
    assert ("g();", "cfg_normal", "z();", "") in e
    assert ("h();", "cfg_normal", "z();", "") in e


def test_try_finally():
    e = cfg(wrap(
        "try { g(); } catch (Exception ex) { h(); } finally { fin(); }\n"
        "        z();"))
    # the finally Block is a SimpleBlock StatementInfo -> a SINGLE CFG node
    # (CFG.java:168-179 default branch; buildTryBlockCFG wraps it whole)
    fin_block = "{\nfin();\n}"
    assert ("g();", "cfg_normal", fin_block, "") in e
    assert ("h();", "cfg_normal", fin_block, "") in e
    assert (fin_block, "cfg_normal", "z();", "") in e


def test_synchronized_block():
    e = cfg(wrap("synchronized (lock) { g(); }\n        h();"))
    assert ("lock", "cfg_true", "g();", "") in e
    assert ("g();", "cfg_normal", "h();", "") in e


def test_nested_bare_block_is_single_node():
    # a nested '{...}' SimpleBlock statement becomes ONE CFG node
    # (CFG.java:168-179 default branch; observed on MyTest.test5)
    e = cfg(wrap("g();\n        { h(); k(); }\n        z();"))
    texts = {s for s, _, o, _ in e} | {o for s, _, o, _ in e}
    block_nodes = [t for t in texts if t.startswith("{")]
    assert len(block_nodes) == 1
    assert ("g();", "cfg_normal", block_nodes[0], "") in e
    assert (block_nodes[0], "cfg_normal", "z();", "") in e


def test_empty_then_branch():
    # an empty '{}' then-branch stays as a SimpleBlock node (setStatement
    # keeps empty blocks, StatementInfo.java:209-211); the condition still
    # exits false-ward because elseStatements is empty
    e = cfg(wrap("if (x > 0) {}\n        h();"))
    assert ("if  ( x > 0 )", "cfg_true", "{\n}", "") in e
    assert ("{\n}", "cfg_normal", "h();", "") in e
    assert ("if  ( x > 0 )", "cfg_false", "h();", "") in e
    assert len(e) == 3


def test_do_while_continue_targets_body_enter():
    """Reference rule: continue in a do-loop jumps to the BODY ENTER node,
    not the condition (cfg/CFG.java:223 passes this.enterNode — a
    deliberate deviation from Java semantics we must reproduce)."""
    src = ("class A { void m(int x) { do { if (x > 1) { continue; } x++; } "
           "while (x < 9); } }")
    from propertygraph_spark.kernel.extract import extract_document
    nodes, triples, _, err = extract_document("d", src)
    assert err is None
    id2text = {n["node_id"]: n["text"] for n in nodes}
    jumps = [(id2text[t["subj"]], id2text[t["obj"]])
             for t in triples if t["pred"] == "cfg_jump"]
    assert jumps == [("continue;", "if  ( x > 1 )")]


def test_multiple_classes_and_overloads():
    """All TypeDeclarations in a unit are processed; overloads get
    distinct method_ids via the ordinal."""
    from propertygraph_spark.kernel.extract import extract_document
    src = ("class A { void m() { int x = 1; } void m(int a) { int y = a; } }"
           " class B { void n() { int z = 2; } }")
    nodes, triples, _, err = extract_document("d", src)
    assert err is None
    methods = sorted({n["method_id"] for n in nodes})
    assert methods == ["d#0:m", "d#1:m", "d#2:n"]
    # each method's graph is self-contained
    for mid in methods:
        assert any(t["method_id"] == mid for t in triples)


def test_switch_default_in_middle_falls_through():
    """default in the middle of a switch participates in fall-through
    order like any case group (buildSwitchBlockCFG chains consecutive
    groups, cfg/CFG.java:361-412)."""
    from propertygraph_spark.kernel.extract import extract_document
    src = ("class A { void m(int x) { switch (x) "
           "{ case 1: f(); default: g(); case 2: h(); break; } } }")
    nodes, triples, _, err = extract_document("d", src)
    assert err is None
    id2text = {n["node_id"]: n["text"] for n in nodes}
    cfg = [(id2text[t["subj"]], id2text[t["obj"]], t["pred"])
           for t in triples if t["pred"].startswith("cfg_")]
    # the switch condition fans out with TRUE control edges to every
    # case label, including the middle default — whose text is ":" (JDT
    # SwitchCase.expressions() is EMPTY for default, so the reference's
    # text loop appends nothing before ":", PEASTVisitor.java:1606-1623)
    cond_true_targets = {b for a, b, p in cfg if p == "cfg_true"}
    assert {"case 1:", ":", "case 2:"} <= cond_true_targets
    # fall-through: f() -> default(":"), g() -> case 2:
    normals = {(a, b) for a, b, p in cfg if p == "cfg_normal"}
    assert ("f();", ":") in normals
    assert ("g();", "case 2:") in normals
