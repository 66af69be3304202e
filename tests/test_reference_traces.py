"""Reference-TRACED edge goldens (de-self-referenced provenance).

The edge constants in this file were hand-derived from the REFERENCE
SOURCE rules — not frozen from kernel output — for two fixtures beyond
PARITY.md's FilenameGuardFilterOld walk:

- SqlInjection.java: def-use chains, uninitialized declarations,
  QualifiedName conditions.
- PortfolioPublishServlet.java: params, try/catch, for loop, the
  method-name def heuristics, and the TreeSet pair-dedup quirk.

Rules used, with reference file:line (full prose trace in PARITY.md
round-3 addendum):
- CFG chaining/if/for/try: CFG.java:546-591, :320-347, :226-275,
  :414-447 (catch bodies CFG-unreachable).
- VDF WITHOUT initializer emits NO def at all (the switch case requires
  expressions.size()==2, ExpressionInfo.java:285-299) -> the variable is
  never registered in any scope, so later defs/uses this-alias
  (StatementInfo.java:286-298) -> `String retval[];` yields
  `this.retval` everywhere.
- Condition nodes' PDG core is the raw ExpressionInfo whose uses are
  NEVER statement-level aliased (only StatementInfo.addVarUse re-scopes,
  StatementInfo.java:319-355) -> a def renamed `this.retval` cannot
  match a use inside `if (retval.length >= 2)` (aliases {retval}) ->
  NO data edge into those conditions (PDG.java:371-377 matchName).
- Only exact DEF kills propagation (PDG.java:417); MAY_DEF generates
  edges but does not kill; the start node checks itself (self-loops,
  PDG.java:320-325).
- TreeSet edge dedup: the second data edge between the same node pair is
  rejected regardless of variable (PDGEdge compareTo = (from, to,
  type.toString()), pdg/edge/PDGEdge.java:78-117); defs iterate in name
  order, so `Integer` (uppercase, sorts first) wins over `total` for the
  L10->L14 and L14->L14/L14->L29 pairs in PortfolioPublishServlet.
- Method-name def heuristics (ExpressionInfo.java:132-178): get/print*
  -> NO_DEF, set/add/... -> DEF, valueOf/sendMessage -> MAY_DEF;
  chained receivers promote inner defs to MAY_DEF
  (ExpressionInfo.java:348-363).
- Try has a null condition, so outer control dependence recurses into
  its statement list with type hardcoded TRUE (PDG.java:470-478 falls
  back to the block variant whose loop passes `true`) -> try-body
  statements inside an ELSE branch still get TRUE edges from the outer
  if condition.
- Control targets: else-statements get FALSE edges; a nested control
  statement is targeted at its condition node; for-initializers and
  updaters get TRUE edges (PDG.java:437-500).
- Enter plumbing: execution Enter -> CFG enter; data Enter -> each
  param; param defs reach uses like any def (PDG.java:238-266).
"""

from __future__ import annotations

from collections import Counter

from propertygraph_spark.kernel.extract import extract_document

FIXDIR = "/root/reference/testcase"


def edge_spans(name: str):
    """Multiset of (pred, subj_span, obj_span, label) + the Enter node's
    outgoing (pred, obj_span, label) set (Enter's own span is the method
    span — matched by text to avoid hardcoding it)."""
    with open(f"{FIXDIR}/{name}") as f:
        src = f.read()
    nodes, triples, _m, err = extract_document(name, src)
    assert err is None, err
    ident = {}
    for n in nodes:
        ident[(n["method_id"], n["node_id"])] = (
            n["text"], f'{n["start_line"]}-{n["end_line"]}')
    edges: Counter = Counter()
    enter_out: Counter = Counter()
    for t in triples:
        st, ss = ident[(t["method_id"], t["subj"])]
        _ot, os_ = ident[(t["method_id"], t["obj"])]
        if st == "Enter":
            enter_out[(t["pred"], os_, t["label"])] += 1
        else:
            edges[(t["pred"], ss, os_, t["label"])] += 1
    return edges, enter_out


def fam(edges: Counter, pred: str) -> Counter:
    return Counter({k: v for k, v in edges.items() if k[0] == pred})


def mk(pred: str, rows) -> Counter:
    """rows: (s_line, o_line, label) with int lines or 'a-b' span strs."""
    out: Counter = Counter()
    for s, o, lab in rows:
        s = s if isinstance(s, str) else f"{s}-{s}"
        o = o if isinstance(o, str) else f"{o}-{o}"
        out[(pred, s, o, lab)] += 1
    return out


# ------------------------------------------------------- SqlInjection.java

SQLI_CFG = (
    mk("cfg_normal", [(3, 4, ""), (4, 5, ""), (5, 6, ""), (6, 7, ""),
                      (7, 8, ""), (8, 9, ""), (9, 11, ""), (11, 12, ""),
                      (13, 14, ""), (14, 15, ""), (15, 16, ""),
                      (17, 20, ""), (19, 20, ""), (20, 23, ""),
                      (23, 24, ""), (24, 26, "")])
    + mk("cfg_true", [(12, 13, ""), (16, 17, "")])
    + mk("cfg_false", [(12, 23, ""), (16, 19, "")]))

SQLI_DATA = mk("pdg_data", [
    (3, 26, "userlist"),
    (7, 23, "tablename"), (8, 23, "username"),
    (11, 13, "this.retval"),
    (13, 13, "this.retval"), (13, 14, "this.retval"),
    (13, 15, "this.retval"),
    (14, 23, "tablename"),
    (15, 15, "this.retval"), (15, 17, "this.retval"),
    (15, 19, "this.retval"),
    (17, 17, "this.retval"), (17, 20, "this.retval"),
    (19, 19, "this.retval"), (19, 20, "this.retval"),
    (20, 23, "username"),
    (23, 24, "userquery"),
])

SQLI_CTRL = (
    mk("pdg_control_true", [(12, 13, ""), (12, 14, ""), (12, 15, ""),
                            (12, 16, ""), (12, 20, ""), (16, 17, "")])
    + mk("pdg_control_false", [(16, 19, "")]))


def test_sqlinjection_matches_reference_trace():
    edges, enter = edge_spans("SqlInjection.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == SQLI_CFG
    assert fam(edges, "pdg_data") == SQLI_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == SQLI_CTRL
    # execution == CFG topology + Enter -> CFG enter (PDG.java:238-247,
    # :503-510); no params, so Enter has exactly that one edge
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in SQLI_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "3-3", ""): 1})


# --------------------------------------------- PortfolioPublishServlet.java

PORT_CFG = (
    mk("cfg_normal", [(3, 4, ""), (4, 5, ""), (8, 9, ""), (10, 13, ""),
                      (13, 14, ""), (14, 15, ""), (15, 18, ""),
                      (18, 19, ""),
                      (19, 19, ""), (19, 19, ""),  # init->cond, upd->cond
                      (20, 19, ""), (22, 23, ""), (23, 24, ""),
                      (25, 27, ""), (27, 28, ""), (28, "29-30", ""),
                      ("29-30", 31, ""), (34, 35, "")])
    + mk("cfg_true", [(5, 6, ""), (9, 10, ""), (19, 20, ""), (24, 25, ""),
                      (33, 34, "")])
    + mk("cfg_false", [(5, 8, ""), (9, 13, ""), (19, 22, ""),
                       (24, 27, "")]))

PORT_DATA = mk("pdg_data", [
    (2, 3, "response"),
    (2, 4, "request"), (2, 8, "request"), (2, 13, "request"),
    (2, 15, "request"), (2, 18, "request"), (2, 23, "request"),
    (3, 6, "out"), (3, 22, "out"), (3, 27, "out"), (3, 28, "out"),
    (3, "29-30", "out"), (3, 31, "out"),
    (4, 5, "stocks"), (4, 20, "stocks"),
    (8, 9, "total"), (8, 14, "total"),
    (10, 10, "Integer"), (10, 14, "Integer"), (10, "29-30", "Integer"),
    (13, 14, "count"), (13, 19, "count"), (13, "29-30", "count"),
    (14, 14, "Integer"), (14, "29-30", "Integer"), (14, 15, "total"),
    (15, 15, "request"), (15, 18, "request"), (15, 23, "request"),
    (18, 20, "client"),
    (19, 19, "i"), (19, 19, "i"), (19, 19, "i"), (19, 19, "i"),
    (23, 24, "refreshRate"), (23, 27, "refreshRate"),
    (23, "29-30", "refreshRate"),
    (25, 27, "refreshRate"), (25, "29-30", "refreshRate"),
    (33, 34, "e"), (33, 35, "e"),
])

PORT_CTRL = (
    mk("pdg_control_true", [
        (5, 6, ""),
        # try-body statements: TRUE from the outer if although they sit
        # in its ELSE branch — Try's null condition makes the control
        # recursion fall back to the block variant, whose statement loop
        # hardcodes true (PDG.java:440-445 via :470-478)
        (5, 18, ""), (5, 19, ""), (5, 19, ""), (5, 22, ""), (5, 23, ""),
        (5, 24, ""), (5, 27, ""), (5, 28, ""), (5, "29-30", ""),
        (5, 31, ""),
        (9, 10, ""),
        (19, 19, ""), (19, 20, ""),  # updater + body
        (24, 25, ""),
        (33, 34, ""), (33, 35, ""),
    ])
    + mk("pdg_control_false", [(5, 8, ""), (5, 9, ""), (5, 13, ""),
                               (5, 14, ""), (5, 15, "")]))


def test_portfolio_matches_reference_trace():
    edges, enter = edge_spans("PortfolioPublishServlet.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == PORT_CFG
    assert fam(edges, "pdg_data") == PORT_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == PORT_CTRL
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in PORT_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    # Enter: execution -> CFG enter (L3) + data -> each parameter
    assert enter == Counter({("pdg_execution", "3-3", ""): 1,
                             ("pdg_data", "2-2", "request"): 1,
                             ("pdg_data", "2-2", "response"): 1})


# --------------------------------------------------- EdgeOperation.java
# Third rule-derived fixture: `this.` field assignment chains + chained
# receivers + the args-carry-no-defs rule. Derivation notes:
# - `this.source` lhs: FieldAccess with This base -> single-entry alias
#   map {this.source} (getVariableNameAliases, TREAT_NON_LOCAL branch);
#   DEF stays `this.source` (already this-prefixed, no re-aliasing).
# - `source.checkPermission(...)`: receiver `source` is undeclared and
#   lowercase -> statement-level this-aliasing to `this.source` with
#   aliases {source, this.source}; "checkPermission" matches no
#   heuristic list -> MAY_DEF -> self-loop + no kill.
# - ARGUMENTS of a call contribute NO defs (the MethodInvocation def
#   case processes only the qualifier, ExpressionInfo.java:331-363), so
#   `sourceJobName.trim()` inside the arg list yields no MAY_DEF of
#   sourceJobName — initially mis-derived as L3/L4 self-loops; the
#   reference drops them. Uses DO pass through (param -> L3/L4 edges).
# - Jenkins/Permission/AbstractProject: uppercase-initial -> never
#   this-aliased (StatementInfo.java:289); getInstance/getItemByFullName
#   are NO_DEF (get prefix) -> no DFS from them.

EDGE_CFG = mk("cfg_normal", [(3, 4, ""), (4, 5, ""), (5, 6, "")])

EDGE_DATA = mk("pdg_data", [
    (2, 3, "sourceJobName"), (2, 4, "targetJobName"),
    (3, 5, "this.source"), (4, 6, "this.target"),
    (5, 5, "this.source"), (6, 6, "this.target"),
])


def test_edgeoperation_matches_reference_trace():
    edges, enter = edge_spans("EdgeOperation.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == EDGE_CFG
    assert fam(edges, "pdg_data") == EDGE_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == Counter()
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in EDGE_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "3-3", ""): 1,
                             ("pdg_data", "2-2", "sourceJobName"): 1,
                             ("pdg_data", "2-2", "targetJobName"): 1})


# --------------------------------------------------------- MyTest.java
# Fourth rule-derived fixture (test5 is the only uncommented method):
# nested bare blocks + variable shadowing. Key rules:
# - A bare Block statement is ONE statement node (SimpleBlock): the CFG
#   treats it as a plain statement — the nested statements do NOT
#   become individual CFG nodes; the block node carries the AGGREGATED
#   defs/uses of its contents (StatementInfo.java:367-435 union).
# - The block node therefore both defs x (inner `int x = 2`,
#   inner-inner `x = 3`) and uses x (three printlns) -> data self-loop.
# - param x: the Enter->param edge is unconditional (PDG.java:262-266),
#   but the param's reach DFS stops at `x = 1` (exact DEF, no use
#   before it) -> no param->statement data edges.
# - `x = 1` (param scope) reaches the BLOCK's x uses by name matching —
#   matchName is name/alias-based, scopes are not consulted
#   (PDG.java:371-377), and the inner DECLARE_AND_DEF would not kill
#   anyway (only exact DEF kills, PDG.java:417).

MYTEST_CFG = mk("cfg_normal", [(56, 58, ""), (58, "59-67", "")])

MYTEST_DATA = mk("pdg_data", [
    (58, "59-67", "x"),
    ("59-67", "59-67", "x"),
])


def test_mytest_matches_reference_trace():
    edges, enter = edge_spans("MyTest.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == MYTEST_CFG
    assert fam(edges, "pdg_data") == MYTEST_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == Counter()
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in MYTEST_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "56-56", ""): 1,
                             ("pdg_data", "55-55", "x"): 1})


# --------------------------------- BaseDataStreamMarshallerOld.java
# Sixth rule-derived fixture: try/catch with returns + heuristics over
# static receivers. Derivation notes:
# - Try body chains L5->L6->L7 (return = exit); catch builds standalone
#   (L8 cond -true-> L9) with NO edge from the body (CFG.java:414-447);
#   execution mirrors ALL CFG edges including the catch's.
# - Class.forName: receiver `Class` is a SimpleName variable shape;
#   "forName" matches no heuristic list -> MAY_DEF Class -> self-loop
#   at L5 (L5 also USEs Class via the VDF rhs promotion). Uppercase ->
#   never this-aliased.
# - clazz.getConstructor -> NO_DEF clazz (get prefix): excluded from
#   the >=MAY_DEF def set, so it neither spawns a DFS nor kills the
#   L5 clazz def -> L5->L6 (clazz) only.
# - constructor.newInstance as the RETURN expression (not an arg) ->
#   MAY_DEF constructor -> L7 self-loop; param `message` used inside
#   the arg array -> uses pass through args -> param->L7 edge.
# - NOTHING flows into the catch: L9 uses className/message but the
#   catch is CFG-unreachable from enter, and the leftover pass
#   (PDG.java:285-292) re-runs dependence only FROM unreachable nodes'
#   own defs (here: `e`, which L9 never uses) -> zero data edges into
#   or out of the catch body.

BDSM_CFG = (mk("cfg_normal", [(5, 6, ""), (6, 7, "")])
            + mk("cfg_true", [(8, 9, "")]))

BDSM_DATA = mk("pdg_data", [
    (5, 5, "Class"), (5, 6, "clazz"),
    (6, 7, "constructor"), (7, 7, "constructor"),
])

BDSM_PARAM_DATA = mk("pdg_data", [(3, 5, "className"), (3, 7, "message")])


def test_marshaller_old_matches_reference_trace():
    edges, enter = edge_spans("BaseDataStreamMarshallerOld.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == BDSM_CFG
    assert fam(edges, "pdg_data") == BDSM_DATA + BDSM_PARAM_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") \
        == mk("pdg_control_true", [(8, 9, "")])
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in BDSM_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "5-5", ""): 1,
                             ("pdg_data", "3-3", "className"): 1,
                             ("pdg_data", "3-3", "message"): 1})
