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


# ------------------------------------------- FilenameGuardFilterNew.java
# Seventh rule-derived fixture: the New guard variant adds a 4-call
# chained reassignment. Derivation notes:
# - L4 `guarded = FileSystems.getDefault().getPath(guarded).normalize()
#   .toString()`: Assignment -> exact DEF guarded (kills). RHS def chain
#   (ExpressionInfo.java:331-363): toString (exact NO_DEF list) has a
#   non-variable qualifier -> forwards defs unpromoted; normalize (no
#   heuristic match -> MAY_DEF) PROMOTES its qualifier's defs to MAY_DEF;
#   getPath/getDefault (get prefix, NO_DEF) forward; base FileSystems is
#   a variable -> VarDef(FileSystems, NO_DEF) -> promoted once through
#   normalize => L4 MAY_DEFs FileSystems (uppercase, never this-aliased).
# - L4 defs iterate name-ordered: FileSystems < guarded, so the
#   (L4,L4) self-loop goes to FileSystems; guarded's self-loop (L4 both
#   defs and uses guarded via the getPath argument) is TreeSet-REJECTED
#   (PDGEdge compareTo ignores the variable).
# - L3's guarded def is killed by L4's exact DEF -> no (3,6)/(3,8)
#   guarded edges; filename's MAY_DEF at L3 doesn't kill the param def.

GUARDNEW_CFG = (mk("cfg_normal", [(3, 4, ""), (4, 5, ""), (6, 8, "")])
                + mk("cfg_true", [(5, 6, "")])
                + mk("cfg_false", [(5, 8, "")]))

GUARDNEW_DATA = mk("pdg_data", [
    (2, 3, "filename"), (2, 6, "filename"),
    (3, 3, "filename"), (3, 6, "filename"), (3, 4, "guarded"),
    (4, 4, "FileSystems"), (4, 6, "guarded"), (4, 8, "guarded"),
    (5, 5, "LOG"), (5, 6, "LOG"),
])


def test_guard_new_matches_reference_trace():
    edges, enter = edge_spans("FilenameGuardFilterNew.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == GUARDNEW_CFG
    assert fam(edges, "pdg_data") == GUARDNEW_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") \
        == mk("pdg_control_true", [(5, 6, "")])
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in GUARDNEW_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "3-3", ""): 1,
                             ("pdg_data", "2-2", "filename"): 1})


# --------------------------------- BaseDataStreamMarshallerNew.java
# Eighth rule-derived fixture: the New marshaller variant adds a second
# statement in the try body and a SECOND catch clause. Derivation notes:
# - Multi-catch: each catch CFG is built standalone
#   (CFG.java:436-447); with no finally, the pseudo finally node is
#   removed -> NO edges between body and catches, and none BETWEEN the
#   two catches. Execution mirrors all CFG edges.
# - L6 `OpenWireUtil.validateIsThrowable(clazz)`: "validateIsThrowable"
#   matches no heuristic -> MAY_DEF OpenWireUtil (uppercase, never
#   this-aliased) -> L6 self-loop; clazz is an ARGUMENT -> no def,
#   uses pass through -> (5,6)/(5,7) clazz from the L5 decl.
# - forName's extra args (false, BaseDataStreamMarshaller.class
#   .getClassLoader()) contribute NO defs (args aren't the qualifier)
#   and no def of those names exists -> no new edges vs the Old trace.
# - Catch 1 defs e (cond node) and L10 `return e` USES it: the leftover
#   pass re-runs dependence from unreachable nodes' own defs
#   (PDG.java:285-292) -> (9,10,e). Catch 2's e is never used (L12 uses
#   className/message, both defined only at reachable nodes) -> nothing
#   flows into L12.

BDSMNEW_CFG = (mk("cfg_normal", [(5, 6, ""), (6, 7, ""), (7, 8, "")])
               + mk("cfg_true", [(9, 10, ""), (11, 12, "")]))

BDSMNEW_DATA = mk("pdg_data", [
    (3, 5, "className"), (3, 8, "message"),
    (5, 5, "Class"), (5, 6, "clazz"), (5, 7, "clazz"),
    (6, 6, "OpenWireUtil"),
    (7, 8, "constructor"), (8, 8, "constructor"),
    (9, 10, "e"),
])


def test_marshaller_new_matches_reference_trace():
    edges, enter = edge_spans("BaseDataStreamMarshallerNew.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == BDSMNEW_CFG
    assert fam(edges, "pdg_data") == BDSMNEW_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") \
        == mk("pdg_control_true", [(9, 10, ""), (11, 12, "")])
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in BDSMNEW_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "5-5", ""): 1,
                             ("pdg_data", "3-3", "className"): 1,
                             ("pdg_data", "3-3", "message"): 1})


# --------------------------------------------- BaseDataMarshaller.java
# Ninth rule-derived fixture: nested if/else where EVERY branch returns
# (no join edges), a 2-line method signature (param nodes on different
# lines), and a set-prefix exact-DEF kill mid-branch. Derivation notes:
# - Params: wireFormat/dataIn sit on signature line 2, bs on line 3 —
#   param nodes span their own declaration line.
# - L8 `wireFormat.setInUnmarshallCache(index, object)`: set prefix ->
#   exact DEF wireFormat -> KILLS the param's and L4's/L7's wireFormat
#   defs on the then-then path (but L9 doesn't use wireFormat, so the
#   kill's only visible effect is the edge DFS stopping).
# - L7 defs iterate name-ordered: object < wireFormat, so (7,8) goes to
#   object and the wireFormat edge into L8 is TreeSet-REJECTED;
#   wireFormat keeps only its L7 self-loop.
# - readShort/readBoolean/tightUnmarshalNestedObject match no heuristic
#   -> MAY_DEF receivers (self-loops at 4,5,6,11,15);
#   getFromUnmarshallCache (get prefix) -> NO_DEF -> L12 has no defs.
# - Control: branch blocks' top-level statements get true/false edges
#   from their owner condition; the nested if contributes its condition
#   node only ((4,5) true), then fans out itself.

BDM_CFG = (mk("cfg_normal", [(6, 7, ""), (7, 8, ""), (8, 9, ""),
                             (11, 12, "")])
           + mk("cfg_true", [(4, 5, ""), (5, 6, "")])
           + mk("cfg_false", [(4, 15, ""), (5, 11, "")]))

BDM_DATA = mk("pdg_data", [
    # params (wireFormat L2, dataIn L2, bs L3)
    (2, 4, "wireFormat"), (2, 7, "wireFormat"), (2, 8, "wireFormat"),
    (2, 12, "wireFormat"), (2, 15, "wireFormat"),
    (2, 6, "dataIn"), (2, 7, "dataIn"), (2, 11, "dataIn"),
    (2, 15, "dataIn"),
    (3, 5, "bs"), (3, 7, "bs"), (3, 15, "bs"),
    # body
    (4, 4, "wireFormat"), (4, 7, "wireFormat"), (4, 8, "wireFormat"),
    (4, 12, "wireFormat"), (4, 15, "wireFormat"),
    (5, 5, "bs"), (5, 7, "bs"),
    (6, 6, "dataIn"), (6, 7, "dataIn"), (6, 8, "index"),
    (7, 7, "wireFormat"), (7, 8, "object"), (7, 9, "object"),
    (8, 8, "wireFormat"),
    (11, 11, "dataIn"), (11, 12, "index"),
    (15, 15, "wireFormat"),
])

BDM_CTRL = (mk("pdg_control_true", [(4, 5, ""), (5, 6, ""), (5, 7, ""),
                                    (5, 8, ""), (5, 9, "")])
            + mk("pdg_control_false", [(4, 15, ""), (5, 11, ""),
                                       (5, 12, "")]))


def test_base_marshaller_matches_reference_trace():
    edges, enter = edge_spans("BaseDataMarshaller.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == BDM_CFG
    assert fam(edges, "pdg_data") == BDM_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == BDM_CTRL
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in BDM_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "4-4", ""): 1,
                             ("pdg_data", "2-2", "wireFormat"): 1,
                             ("pdg_data", "2-2", "dataIn"): 1,
                             ("pdg_data", "3-3", "bs"): 1})


# --------------------------------------------- ActiveMQMapMessage.java
# Tenth rule-derived fixture: ternary, lambda exclusion, and a local
# shadowing a field. Derivation notes:
# - L20 `final Map<String,Object> map = content != null ?
#   deserialize(content) : null`: the local DECLAREs map, so later uses
#   never this-alias despite the same-named FIELD (L14) — fields are
#   only reached via the undeclared-lowercase fallback
#   (StatementInfo.java:286-298). Trinomial forwards subexpression defs
#   (default case); deserialize/storeContent/getContent have NO
#   qualifier -> the MethodInvocation def case requires one -> no defs.
# - L24 `if (map != null && !map.isEmpty())` is ONE condition node;
#   isEmpty is exact NO_DEF -> the condition has no >=MAY_DEF defs.
# - L25 `map.replaceAll((k, v) -> ...)`: "replaceAll" matches no
#   heuristic (replace/replaceAll not in the lists; `remove` prefix
#   doesn't match) -> MAY_DEF map -> self-loop; the LAMBDA argument is
#   excluded wholesale (P3): k/v/UTF8Buffer contribute nothing.
# - Param asType is never used -> Enter->param only, no param edges.
# - Field initializers (L12, L14) are not methods -> no nodes at all.

AMQMM_CFG = (mk("cfg_normal", [(18, 19, ""), (19, 20, ""), (20, 24, ""),
                               (25, 26, "")])
             + mk("cfg_true", [(24, 25, "")])
             + mk("cfg_false", [(24, 28, "")]))

AMQMM_DATA = mk("pdg_data", [
    (19, 20, "content"),
    (20, 24, "map"), (20, 25, "map"), (20, 26, "map"),
    (25, 25, "map"), (25, 26, "map"),
])

AMQMM_CTRL = (mk("pdg_control_true", [(24, 25, ""), (24, 26, "")])
              + mk("pdg_control_false", [(24, 28, "")]))


def test_activemq_matches_reference_trace():
    edges, enter = edge_spans("ActiveMQMapMessage.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == AMQMM_CFG
    assert fam(edges, "pdg_data") == AMQMM_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == AMQMM_CTRL
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in AMQMM_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "18-18", ""): 1,
                             ("pdg_data", "17-17", "asType"): 1})


# --------------------------------------------- AmqpAdvisoryTest.java
# Eleventh rule-derived fixture — completes 11/11 reference-traced
# goldens. Three straight-line methods; the value is in def/use:
# - INHERITED/class fields this-alias: connection1/connection2 are class
#   fields and advisorySupport is inherited — all lowercase and not in
#   any local scope -> statement-level aliasing renames defs/uses to
#   this.X with aliases {X, this.X} (StatementInfo.java:286-298), so
#   edge labels are this.connection1/this.connection2.
# - setUp: `advisorySupport = true` defs this.advisorySupport, nothing
#   uses it, `super.setUp()` is a SuperMethodInvocation (default def
#   case, no qualifier) -> zero data edges in the whole method.
# - No-qualifier calls (createAmqpConnection, assertNotNull,
#   assertEquals) emit NO defs even from their arguments (the
#   MethodInvocation def case requires a qualifier), so
#   `assertEquals(.., connectMessage.getStringProperty(..))` only USES
#   connectMessage.
# - start/close/receive/create* match no heuristic -> MAY_DEF receivers
#   (the create* family: "contains" is a prefix but doesn't match) ->
#   receiver self-loops everywhere.
# - L74 `connection.setExceptionListener(Throwable::printStackTrace)`:
#   set prefix -> exact DEF connection -> kills L73's connection def
#   (so no 73->75/73->76 edges); the method-reference argument
#   contributes nothing (no def case for ExpressionMethodReference).
# - Name-ordered defs + TreeSet dedup: at L49 advisoryTopic < session1
#   takes (49,50); session1's edge is rejected and it keeps the
#   self-loop; same pattern at L56 (queue beats session2 for (56,57)).

AMQP_CFG = mk("cfg_normal", [
    (40, 41, ""),
    (46, 47, ""), (47, 48, ""), (48, 49, ""), (49, 50, ""), (50, 53, ""),
    (53, 54, ""), (54, 55, ""), (55, 56, ""), (56, 57, ""), (57, 59, ""),
    (59, 60, ""), (60, 61, ""), (61, 63, ""), (63, 65, ""), (65, 66, ""),
    (66, 67, ""), (67, 68, ""),
    (72, 73, ""), (73, 74, ""), (74, 75, ""), (75, 76, ""),
])

AMQP_DATA = mk("pdg_data", [
    (46, 47, "this.connection1"), (46, 48, "this.connection1"),
    (46, 68, "this.connection1"),
    (47, 47, "this.connection1"), (47, 48, "this.connection1"),
    (47, 68, "this.connection1"),
    (48, 48, "this.connection1"), (48, 68, "this.connection1"),
    (48, 49, "session1"), (48, 50, "session1"),
    (49, 49, "session1"), (49, 50, "advisoryTopic"),
    (50, 50, "session1"),
    (50, 59, "advisoryTopicConsumer"), (50, 65, "advisoryTopicConsumer"),
    (53, 54, "this.connection2"), (53, 55, "this.connection2"),
    (53, 63, "this.connection2"),
    (54, 54, "this.connection2"), (54, 55, "this.connection2"),
    (54, 63, "this.connection2"),
    (55, 55, "this.connection2"), (55, 63, "this.connection2"),
    (55, 56, "session2"), (55, 57, "session2"),
    (56, 56, "session2"), (56, 57, "queue"),
    (57, 57, "session2"),
    (59, 59, "advisoryTopicConsumer"), (59, 65, "advisoryTopicConsumer"),
    (59, 60, "connectMessage"), (59, 61, "connectMessage"),
    (63, 63, "this.connection2"),
    (65, 65, "advisoryTopicConsumer"),
    (65, 66, "removeMessage"), (65, 67, "removeMessage"),
    (68, 68, "this.connection1"),
    (72, 73, "factory"), (73, 73, "factory"),
    (73, 74, "connection"),
    (74, 74, "connection"), (74, 75, "connection"), (74, 76, "connection"),
    (75, 75, "connection"), (75, 76, "connection"),
])


def test_amqp_matches_reference_trace():
    edges, enter = edge_spans("AmqpAdvisoryTest.java")
    assert fam(edges, "cfg_normal") + fam(edges, "cfg_true") \
        + fam(edges, "cfg_false") == AMQP_CFG
    assert fam(edges, "pdg_data") == AMQP_DATA
    assert fam(edges, "pdg_control_true") \
        + fam(edges, "pdg_control_false") == Counter()
    want_exec = Counter({("pdg_execution", s, o, ""): n
                         for (_p, s, o, _l), n in AMQP_CFG.items()})
    assert fam(edges, "pdg_execution") == want_exec
    assert enter == Counter({("pdg_execution", "40-40", ""): 1,
                             ("pdg_execution", "46-46", ""): 1,
                             ("pdg_execution", "72-72", ""): 1})


# ----------------------------------------- ast_child (PE-tree) traces
# The ast_child family is the PE tree PEASTVisitor builds — the one
# in-memory structure the reference's CFG/PDG derive from. (The astdemo
# `-a` DOT additionally dumps the raw JDT preorder keyed by JVM identity
# hashCodes — nondeterministic and documented in COVERAGE.md as not
# replicated.) The golden below is hand-derived from the visitor rules:
# - MethodDeclaration: addParameter per param; body SimpleBlock SPLICED
#   into the method's statement list (MethodInfo.setStatement replaces
#   itself with getStatements() when the child is a SimpleBlock,
#   MethodInfo.java:89-96; Block visit builds the SimpleBlock,
#   PEASTVisitor.java:1697-1724; method text = modifiers + return type
#   + name + " (" + params + ") " + body, PEASTVisitor.java:261-303).
# - SingleVariableDeclaration (param): ONE child, the TypeInfo; the
#   name is text-only (PEASTVisitor.java:1760-1790).
# - VariableDeclarationStatement: children = TypeInfo + each fragment
#   (PEASTVisitor.java:1173-1211); the fragment's children = name +
#   initializer, text "name = init" (PEASTVisitor.java:1214-1243).
# - MethodInvocation: qualifier via setQualifier + children name + each
#   argument; text "qual.name(a,b)" — no spaces after commas
#   (PEASTVisitor.java:981-1029).
# - IfStatement: children = condition + spliced then-statements; the
#   statement text embeds the UNPREFIXED condition ("if (c) {...}")
#   because condition.setText("if " + ...) runs AFTER the append
#   (PEASTVisitor.java:1384-1420) — so the condition NODE text carries
#   the "if " prefix while the if text does not repeat it.
# - InfixExpression: children left, operator, right, then PER extended
#   operand the SAME OperatorInfo instance again + the operand
#   (PEASTVisitor.java:636-686) — one '+' node, THREE parent edges;
#   text " ( left + right ) + ext1 + ext2".
# - ReturnStatement/ExpressionStatement: single expression child with
#   "expr;" text (PEASTVisitor.java:1055-1081, :933-954).
# - StringLiteral text quotes the LITERAL VALUE (escapes decoded:
#   source "\\" renders as "\"), SimpleName text = identifier
#   (PEASTVisitor.java:492-498, :589-595).

GUARD_INNER = 'filename.replace(":","_")'
GUARD_MID = GUARD_INNER + '.replace("\\","")'
GUARD_OUTER = GUARD_MID + '.replace("/","")'
GUARD_FRAG = "guarded = " + GUARD_OUTER
GUARD_VDS = "String " + GUARD_FRAG + ";"
GUARD_COND = "if LOG.isDebugEnabled()"
GUARD_INFIX = ' ( "guarded " + filename ) + " to " + guarded'
GUARD_DBG = "LOG.debug(" + GUARD_INFIX + ")"
GUARD_DBGS = GUARD_DBG + ";"
GUARD_IFS = "if (LOG.isDebugEnabled()) {\n" + GUARD_DBGS + "\n}"
GUARD_RET = "return guarded;"
GUARD_PARAM = "String filename"
GUARD_METHOD = ("private String guard (String filename) {\n"
                + GUARD_VDS + "\n" + GUARD_IFS + "\n" + GUARD_RET + "\n}")

GUARD_AST = Counter()
for _s, _ss, _o, _os, _n in [
    (GUARD_METHOD, "2-8", GUARD_PARAM, "2-2", 1),
    (GUARD_METHOD, "2-8", GUARD_VDS, "3-3", 1),
    (GUARD_METHOD, "2-8", GUARD_IFS, "4-6", 1),
    (GUARD_METHOD, "2-8", GUARD_RET, "7-7", 1),
    (GUARD_PARAM, "2-2", "String", "2-2", 1),
    (GUARD_VDS, "3-3", "String", "3-3", 1),
    (GUARD_VDS, "3-3", GUARD_FRAG, "3-3", 1),
    (GUARD_FRAG, "3-3", "guarded", "3-3", 1),
    (GUARD_FRAG, "3-3", GUARD_OUTER, "3-3", 1),
    (GUARD_INNER, "3-3", "filename", "3-3", 1),
    (GUARD_INNER, "3-3", "replace", "3-3", 1),
    (GUARD_INNER, "3-3", '":"', "3-3", 1),
    (GUARD_INNER, "3-3", '"_"', "3-3", 1),
    (GUARD_MID, "3-3", GUARD_INNER, "3-3", 1),
    (GUARD_MID, "3-3", "replace", "3-3", 1),
    (GUARD_MID, "3-3", '"\\"', "3-3", 1),
    (GUARD_MID, "3-3", '""', "3-3", 1),
    (GUARD_OUTER, "3-3", GUARD_MID, "3-3", 1),
    (GUARD_OUTER, "3-3", "replace", "3-3", 1),
    (GUARD_OUTER, "3-3", '"/"', "3-3", 1),
    (GUARD_OUTER, "3-3", '""', "3-3", 1),
    (GUARD_IFS, "4-6", GUARD_COND, "4-4", 1),
    (GUARD_IFS, "4-6", GUARD_DBGS, "5-5", 1),
    (GUARD_COND, "4-4", "LOG", "4-4", 1),
    (GUARD_COND, "4-4", "isDebugEnabled", "4-4", 1),
    (GUARD_DBGS, "5-5", GUARD_DBG, "5-5", 1),
    (GUARD_DBG, "5-5", "LOG", "5-5", 1),
    (GUARD_DBG, "5-5", "debug", "5-5", 1),
    (GUARD_DBG, "5-5", GUARD_INFIX, "5-5", 1),
    (GUARD_INFIX, "5-5", '"guarded "', "5-5", 1),
    (GUARD_INFIX, "5-5", "filename", "5-5", 1),
    (GUARD_INFIX, "5-5", '" to "', "5-5", 1),
    (GUARD_INFIX, "5-5", "guarded", "5-5", 1),
    (GUARD_INFIX, "5-5", "+", "5-5", 3),
    (GUARD_RET, "7-7", "guarded", "7-7", 1),
]:
    GUARD_AST[(_s, _ss, _o, _os)] += _n


def ast_edge_texts(name: str) -> Counter:
    """Multiset of (subj_text, subj_span, obj_text, obj_span) for the
    ast_child family (text identity matters: many nodes share spans)."""
    with open(f"{FIXDIR}/{name}") as f:
        src = f.read()
    nodes, triples, _m, err = extract_document(name, src)
    assert err is None, err
    ident = {}
    for n in nodes:
        ident[(n["method_id"], n["node_id"])] = (
            n["text"], f'{n["start_line"]}-{n["end_line"]}')
    out: Counter = Counter()
    for t in triples:
        if t["pred"] != "ast_child":
            continue
        st, ss = ident[(t["method_id"], t["subj"])]
        ot, os_ = ident[(t["method_id"], t["obj"])]
        out[(st, ss, ot, os_)] += 1
    return out


def test_guard_old_ast_matches_reference_trace():
    assert ast_edge_texts("FilenameGuardFilterOld.java") == GUARD_AST


# FilenameGuardFilterNew.java ast_child: adds an Assignment statement
# whose RHS is a FOUR-call chain. New rules exercised vs the Old guard:
# - Assignment: children = LHS + OperatorInfo('=') + RHS, text
#   "lhs = rhs" (PEASTVisitor.java:754-783); the ExpressionStatement
#   wraps it with ";".
# - Chained MethodInvocation: each link's QUALIFIER is the previous
#   invocation (setQualifier — still a PE child), so the chain is a
#   4-deep qualifier spine, each node also holding its name + args
#   (PEASTVisitor.java:981-1029).

NG_INNER = 'filename.replace(":","_")'
NG_FRAG = "guarded = " + NG_INNER
NG_VDS = "String " + NG_FRAG + ";"
NG_C1 = "FileSystems.getDefault()"
NG_C2 = NG_C1 + ".getPath(guarded)"
NG_C3 = NG_C2 + ".normalize()"
NG_C4 = NG_C3 + ".toString()"
NG_ASSIGN = "guarded = " + NG_C4
NG_ASSIGNS = NG_ASSIGN + ";"
NG_COND = "if LOG.isDebugEnabled()"
NG_INFIX = ' ( "guarded " + filename ) + " to " + guarded'
NG_DBG = "LOG.debug(" + NG_INFIX + ")"
NG_DBGS = NG_DBG + ";"
NG_IFS = "if (LOG.isDebugEnabled()) {\n" + NG_DBGS + "\n}"
NG_RET = "return guarded;"
NG_PARAM = "String filename"
NG_METHOD = ("private String guard (String filename) {\n"
             + NG_VDS + "\n" + NG_ASSIGNS + "\n" + NG_IFS + "\n"
             + NG_RET + "\n}")

NG_AST = Counter()
for _s, _ss, _o, _os, _n in [
    (NG_METHOD, "2-9", NG_PARAM, "2-2", 1),
    (NG_METHOD, "2-9", NG_VDS, "3-3", 1),
    (NG_METHOD, "2-9", NG_ASSIGNS, "4-4", 1),
    (NG_METHOD, "2-9", NG_IFS, "5-7", 1),
    (NG_METHOD, "2-9", NG_RET, "8-8", 1),
    (NG_PARAM, "2-2", "String", "2-2", 1),
    (NG_VDS, "3-3", "String", "3-3", 1),
    (NG_VDS, "3-3", NG_FRAG, "3-3", 1),
    (NG_FRAG, "3-3", "guarded", "3-3", 1),
    (NG_FRAG, "3-3", NG_INNER, "3-3", 1),
    (NG_INNER, "3-3", "filename", "3-3", 1),
    (NG_INNER, "3-3", "replace", "3-3", 1),
    (NG_INNER, "3-3", '":"', "3-3", 1),
    (NG_INNER, "3-3", '"_"', "3-3", 1),
    (NG_ASSIGNS, "4-4", NG_ASSIGN, "4-4", 1),
    (NG_ASSIGN, "4-4", "guarded", "4-4", 1),
    (NG_ASSIGN, "4-4", "=", "4-4", 1),
    (NG_ASSIGN, "4-4", NG_C4, "4-4", 1),
    (NG_C1, "4-4", "FileSystems", "4-4", 1),
    (NG_C1, "4-4", "getDefault", "4-4", 1),
    (NG_C2, "4-4", NG_C1, "4-4", 1),
    (NG_C2, "4-4", "getPath", "4-4", 1),
    (NG_C2, "4-4", "guarded", "4-4", 1),
    (NG_C3, "4-4", NG_C2, "4-4", 1),
    (NG_C3, "4-4", "normalize", "4-4", 1),
    (NG_C4, "4-4", NG_C3, "4-4", 1),
    (NG_C4, "4-4", "toString", "4-4", 1),
    (NG_IFS, "5-7", NG_COND, "5-5", 1),
    (NG_IFS, "5-7", NG_DBGS, "6-6", 1),
    (NG_COND, "5-5", "LOG", "5-5", 1),
    (NG_COND, "5-5", "isDebugEnabled", "5-5", 1),
    (NG_DBGS, "6-6", NG_DBG, "6-6", 1),
    (NG_DBG, "6-6", "LOG", "6-6", 1),
    (NG_DBG, "6-6", "debug", "6-6", 1),
    (NG_DBG, "6-6", NG_INFIX, "6-6", 1),
    (NG_INFIX, "6-6", '"guarded "', "6-6", 1),
    (NG_INFIX, "6-6", "filename", "6-6", 1),
    (NG_INFIX, "6-6", '" to "', "6-6", 1),
    (NG_INFIX, "6-6", "guarded", "6-6", 1),
    (NG_INFIX, "6-6", "+", "6-6", 3),
    (NG_RET, "8-8", "guarded", "8-8", 1),
]:
    NG_AST[(_s, _ss, _o, _os)] += _n


def test_guard_new_ast_matches_reference_trace():
    assert ast_edge_texts("FilenameGuardFilterNew.java") == NG_AST
