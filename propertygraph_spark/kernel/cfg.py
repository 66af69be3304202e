"""Intra-method control-flow graph builder.

Faithful re-expression of /root/reference .../cfg/CFG.java (cited lines).
Quirks intentionally preserved:

- an edge leaving a control node always carries a polarity; chaining a
  conditional's exit (its condition node) to the next statement yields a
  'false' control edge (cfg/edge/CFGEdge.java:55-66);
- break/continue nodes are not exits of their own CFG; they are resolved at
  the enclosing loop/switch (CFG.java:171-175, 495-539);
- catch blocks get no edges from the try body (CFG-unreachable,
  CFG.java:414-447); PDG processes them via the leftover pass;
- pseudo nodes (empty bodies, foreach/for(;;) missing conditions) are
  spliced out, predecessors x successors re-linked with makeEdge
  (CFG.java:452-489);
- a try block contributes only its finally CFG's *exit* nodes to the node
  set (CFG.java:425 — reference behavior, reproduced verbatim);
- edge identity/dedup is (from, to, type-string) as in the reference's
  TreeSet compareTo (CFGEdge.java:105-119): a later edge between the same
  pair with the same type string is dropped.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .pe import (ExpressionInfo, IdGen, MethodInfo, PE, PseudoElement,
                 StatementInfo)

# node kinds
K_NORMAL = "normal"
K_CONTROL = "control"
K_BREAK = "break"
K_CONTINUE = "continue"
K_CASE = "case"
K_PSEUDO = "pseudo"
K_EXPRESSION = "expression"


class CFGEdge:
    __slots__ = ("from_node", "to_node", "type_str", "label")

    def __init__(self, from_node: "CFGNode", to_node: "CFGNode",
                 type_str: str, label: str):
        self.from_node = from_node
        self.to_node = to_node
        self.type_str = type_str  # 'normal' | 'control' | 'jump'
        self.label = label        # '' | 'true' | 'false' | 'jump'

    def key(self) -> Tuple[int, int, str]:
        return (self.from_node.core.pe_id, self.to_node.core.pe_id, self.type_str)


class CFGNode:
    __slots__ = ("core", "kind", "forward", "backward")

    def __init__(self, core: PE, kind: str):
        self.core = core
        self.kind = kind
        self.forward: Dict[Tuple[int, int, str], CFGEdge] = {}
        self.backward: Dict[Tuple[int, int, str], CFGEdge] = {}

    @property
    def is_control(self) -> bool:
        return self.kind == K_CONTROL

    def forward_nodes(self) -> List["CFGNode"]:
        seen: Dict[int, CFGNode] = {}
        for e in self.forward.values():
            seen.setdefault(e.to_node.core.pe_id, e.to_node)
        return [seen[k] for k in sorted(seen)]

    def backward_nodes(self) -> List["CFGNode"]:
        seen: Dict[int, CFGNode] = {}
        for e in self.backward.values():
            seen.setdefault(e.from_node.core.pe_id, e.from_node)
        return [seen[k] for k in sorted(seen)]

    def sorted_forward_edges(self) -> List[CFGEdge]:
        return [self.forward[k] for k in sorted(self.forward)]

    def __repr__(self):
        return f"<CFGNode {self.kind} #{self.core.pe_id} {self.core.text[:30]!r}>"


def _add_edge(edge: CFGEdge) -> None:
    k = edge.key()
    # TreeSet semantics: first insertion wins (CFGEdge.compareTo)
    edge.from_node.forward.setdefault(k, edge)
    edge.to_node.backward.setdefault(k, edge)


def make_edge(from_node: CFGNode, to_node: CFGNode) -> CFGEdge:
    """CFGEdge.makeEdge (cfg/edge/CFGEdge.java:55-66)."""
    if from_node.kind == K_CONTROL:
        return CFGEdge(from_node, to_node, "control", "false")
    if from_node.kind in (K_BREAK, K_CONTINUE):
        return CFGEdge(from_node, to_node, "jump", "jump")
    return CFGEdge(from_node, to_node, "normal", "")


def make_control_edge(from_node: CFGNode, to_node: CFGNode, control: bool) -> CFGEdge:
    """CFGEdge.makeControlEdge (CFGEdge.java:37-49): pseudo source -> normal."""
    if from_node.kind == K_CONTROL:
        return CFGEdge(from_node, to_node, "control", "true" if control else "false")
    return CFGEdge(from_node, to_node, "normal", "")


class CFGNodeFactory:
    """cfg/node/CFGNodeFactory.java: statements/conditions cached by PE;
    expressions NOT cached (reference behavior)."""

    def __init__(self, idgen: IdGen):
        self.idgen = idgen
        self.map: Dict[int, CFGNode] = {}

    def make_normal_node(self, element: Optional[PE]) -> CFGNode:
        if element is None:
            return CFGNode(PseudoElement(self.idgen), K_PSEUDO)
        node = self.map.get(element.pe_id)
        if node is not None:
            return node
        if isinstance(element, StatementInfo):
            kind = {"Break": K_BREAK, "Continue": K_CONTINUE,
                    "Case": K_CASE}.get(element.category, K_NORMAL)
            node = CFGNode(element, kind)
            self.map[element.pe_id] = node
            return node
        if isinstance(element, ExpressionInfo):
            return CFGNode(element, K_EXPRESSION)  # not cached (reference)
        return CFGNode(element, K_NORMAL)

    def make_control_node(self, expression: Optional[PE]) -> CFGNode:
        if expression is None:
            return CFGNode(PseudoElement(self.idgen), K_PSEUDO)
        node = self.map.get(expression.pe_id)
        if node is None:
            node = CFGNode(expression, K_CONTROL)
            self.map[expression.pe_id] = node
        return node

    def get_node(self, element: PE) -> Optional[CFGNode]:
        return self.map.get(element.pe_id)


class CFG:
    """cfg/CFG.java."""

    def __init__(self, core: Optional[PE], factory: CFGNodeFactory):
        self.core = core
        self.factory = factory
        self.nodes: Dict[int, CFGNode] = {}          # sorted by pe_id on read
        self.enter_node: Optional[CFGNode] = None
        self.exit_nodes: Dict[int, CFGNode] = {}
        self.unhandled_breaks: List[CFGNode] = []
        self.unhandled_continues: List[CFGNode] = []
        self.built = False

    # --------------------------------------------------------- collections

    def is_empty(self) -> bool:
        return not self.nodes

    def all_nodes(self) -> List[CFGNode]:
        return [self.nodes[k] for k in sorted(self.nodes)]

    def exit_node_list(self) -> List[CFGNode]:
        return [self.exit_nodes[k] for k in sorted(self.exit_nodes)]

    def _add_node(self, n: CFGNode) -> None:
        self.nodes[n.core.pe_id] = n

    def _add_exit(self, n: CFGNode) -> None:
        self.exit_nodes[n.core.pe_id] = n

    # -------------------------------------------------------------- build

    def build(self) -> "CFG":
        assert not self.built
        self.built = True
        core = self.core
        if core is None:
            node = self.factory.make_normal_node(None)
            self._add_node(node)
            self.enter_node = node
            self._add_exit(node)
        elif isinstance(core, StatementInfo):
            cat = core.category
            if cat in ("Catch", "Synchronized"):
                self._build_conditional_block(core, loop=False)
            elif cat == "Do":
                self._build_do_block(core)
            elif cat == "For":
                self._build_for_block(core)
            elif cat in ("Foreach", "While"):
                self._build_conditional_block(core, loop=True)
            elif cat == "If":
                self._build_if_block(core)
            elif cat == "Switch":
                self._build_switch_block(core)
            elif cat == "TypeDeclaration":
                pass
            elif cat == "Try":
                self._build_try_block(core)
            else:
                node = self.factory.make_normal_node(core)
                self.enter_node = node
                if cat == "Break":
                    self.unhandled_breaks.insert(0, node)
                elif cat == "Continue":
                    self.unhandled_continues.insert(0, node)
                else:
                    self._add_exit(node)
                self._add_node(node)
        elif isinstance(core, ExpressionInfo):
            node = self.factory.make_normal_node(core)
            self.enter_node = node
            self._add_exit(node)
            self._add_node(node)
        elif isinstance(core, MethodInfo):
            if not core.lambda_:
                self._build_sequential_into_self(core.statements)
        else:
            pass
        if core is not None:
            self._remove_pseudo_nodes()
        return self

    # ------------------------------------------------- sequential chaining

    def _sequential(self, elements: List[PE]) -> "CFG":
        """SequentialCFGs (CFG.java:546-591)."""
        seq = CFG(None, self.factory)
        seq.built = True
        sub_cfgs: List[CFG] = []
        for element in elements:
            sub = CFG(element, self.factory).build()
            if not sub.is_empty():
                sub_cfgs.append(sub)
        for i in range(1, len(sub_cfgs)):
            anterior, posterior = sub_cfgs[i - 1], sub_cfgs[i]
            for exit_node in anterior.exit_node_list():
                _add_edge(make_edge(exit_node, posterior.enter_node))
        if not sub_cfgs:
            pseudo = CFG(None, self.factory)
            # core None -> pseudo node, no pseudo-removal
            node = self.factory.make_normal_node(None)
            pseudo.built = True
            pseudo._add_node(node)
            pseudo.enter_node = node
            pseudo._add_exit(node)
            sub_cfgs.append(pseudo)
        seq.enter_node = sub_cfgs[0].enter_node
        for n in sub_cfgs[-1].exit_node_list():
            seq._add_exit(n)
        for cfg in sub_cfgs:
            seq.nodes.update(cfg.nodes)
            seq.unhandled_breaks.extend(cfg.unhandled_breaks)
            seq.unhandled_continues.extend(cfg.unhandled_continues)
        return seq

    def _build_sequential_into_self(self, statements: List[PE]) -> None:
        """buildSimpleBlockCFG (CFG.java:349-359)."""
        seq = self._sequential(statements)
        self.enter_node = seq.enter_node
        self.exit_nodes.update(seq.exit_nodes)
        self.nodes.update(seq.nodes)
        self.unhandled_breaks.extend(seq.unhandled_breaks)
        self.unhandled_continues.extend(seq.unhandled_continues)

    # ------------------------------------------------------- shape builders

    def _build_do_block(self, st: StatementInfo) -> None:
        """CFG.java:199-224."""
        seq = self._sequential(st.statements)
        cond = self.factory.make_control_node(st.condition)
        self.enter_node = seq.enter_node
        self.nodes.update(seq.nodes)
        self._add_node(cond)
        self._add_exit(cond)
        self.unhandled_breaks.extend(seq.unhandled_breaks)
        self.unhandled_continues.extend(seq.unhandled_continues)
        for exit_node in seq.exit_node_list():
            _add_edge(make_edge(exit_node, cond))
        _add_edge(make_control_edge(cond, seq.enter_node, True))
        self._connect_breaks(st)
        self._connect_continues(st, self.enter_node)

    def _build_for_block(self, st: StatementInfo) -> None:
        """CFG.java:226-275."""
        seq = self._sequential(st.statements)
        init_cfg = self._sequential(st.initializers)
        cond = self.factory.make_control_node(st.condition)
        upd_cfg = self._sequential(st.updaters)

        self.enter_node = init_cfg.enter_node
        self._add_exit(cond)
        self.nodes.update(seq.nodes)
        self.nodes.update(init_cfg.nodes)
        self._add_node(cond)
        self.nodes.update(upd_cfg.nodes)
        self.unhandled_breaks.extend(seq.unhandled_breaks)
        self.unhandled_continues.extend(seq.unhandled_continues)

        for n in init_cfg.exit_node_list():
            _add_edge(make_edge(n, cond))
        _add_edge(make_control_edge(cond, seq.enter_node, True))
        for n in seq.exit_node_list():
            _add_edge(make_edge(n, upd_cfg.enter_node))
        for n in upd_cfg.exit_node_list():
            _add_edge(make_edge(n, cond))

        self._connect_breaks(st)
        self._connect_continues(st, cond)

    def _build_conditional_block(self, st: StatementInfo, loop: bool) -> None:
        """CFG.java:277-318 (While/Foreach/Catch/Synchronized; If base)."""
        sub_statements = st.statements
        seq = self._sequential(sub_statements)
        cond = self.factory.make_control_node(st.condition)

        self.enter_node = cond
        self.nodes.update(seq.nodes)
        self._add_node(cond)
        if loop:
            self._add_exit(cond)
        else:
            self.exit_nodes.update(seq.exit_nodes)
            if not sub_statements:
                self._add_exit(cond)
        self.unhandled_breaks.extend(seq.unhandled_breaks)
        self.unhandled_continues.extend(seq.unhandled_continues)

        _add_edge(make_control_edge(cond, seq.enter_node, True))

        if loop:
            for exit_node in seq.exit_node_list():
                if exit_node.kind == K_BREAK:
                    self._add_exit(exit_node)
                else:
                    _add_edge(make_edge(exit_node, cond))
            self._connect_breaks(st)
            self._connect_continues(st, cond)

    def _build_if_block(self, st: StatementInfo) -> None:
        """CFG.java:320-347 (else CFG is ALWAYS built; empty else ->
        pseudo -> splice leaves the condition as an exit)."""
        self._build_conditional_block(st, loop=False)
        cond = self.factory.make_control_node(st.condition)

        else_statements = st.else_statements
        else_cfg = self._sequential(else_statements)
        self.nodes.update(else_cfg.nodes)
        self.exit_nodes.update(else_cfg.exit_nodes)
        if not else_statements:
            self._add_exit(cond)
        _add_edge(make_control_edge(cond, else_cfg.enter_node, False))
        self.unhandled_breaks.extend(else_cfg.unhandled_breaks)
        self.unhandled_continues.extend(else_cfg.unhandled_continues)

    def _build_switch_block(self, st: StatementInfo) -> None:
        """CFG.java:361-412."""
        cond = self.factory.make_control_node(st.condition)
        self.enter_node = cond
        self._add_node(cond)

        sub_statements = st.statements
        sub_cfgs: List[CFG] = []
        for sub in sub_statements:
            sub_cfg = CFG(sub, self.factory).build()
            sub_cfgs.append(sub_cfg)
            self.nodes.update(sub_cfg.nodes)
            self.unhandled_breaks.extend(sub_cfg.unhandled_breaks)
            self.unhandled_continues.extend(sub_cfg.unhandled_continues)
            if sub.category == "Case":
                _add_edge(make_control_edge(cond, sub_cfg.enter_node, True))
            elif sub.category in ("Break", "Continue"):
                self.exit_nodes.update(sub_cfg.exit_nodes)

        for i in range(1, len(sub_cfgs)):
            anterior, posterior = sub_cfgs[i - 1], sub_cfgs[i]
            if isinstance(anterior.core, StatementInfo) and \
                    anterior.core.category in ("Break", "Continue"):
                continue
            for exit_node in anterior.exit_node_list():
                _add_edge(make_edge(exit_node, posterior.enter_node))

        if sub_cfgs:
            self.exit_nodes.update(sub_cfgs[-1].exit_nodes)
        self._connect_breaks(st)

    def _build_try_block(self, st: StatementInfo) -> None:
        """CFG.java:414-447 — no body->catch edges; only finally *exits*
        join the node set (reference quirk, line 425)."""
        seq = self._sequential(st.statements)
        finally_cfg = CFG(st.finally_statement, self.factory).build()

        self.enter_node = seq.enter_node
        self.nodes.update(seq.nodes)
        self.nodes.update(finally_cfg.exit_nodes)
        self.exit_nodes.update(finally_cfg.exit_nodes)
        self.unhandled_breaks.extend(seq.unhandled_breaks)
        self.unhandled_continues.extend(seq.unhandled_continues)

        for n in seq.exit_node_list():
            _add_edge(make_edge(n, finally_cfg.enter_node))

        for catch_st in st.catch_statements:
            catch_cfg = CFG(catch_st, self.factory).build()
            self.nodes.update(catch_cfg.nodes)
            for n in catch_cfg.exit_node_list():
                _add_edge(make_edge(n, finally_cfg.enter_node))

    # --------------------------------------------------- pseudo-node splice

    def _remove_pseudo_nodes(self) -> None:
        """CFG.java:452-489."""
        for pe_id in sorted(self.nodes):
            node = self.nodes.get(pe_id)
            if node is None or node.kind != K_PSEUDO:
                continue
            del self.nodes[pe_id]

            if self.enter_node is not None and \
                    node.core.pe_id == self.enter_node.core.pe_id:
                fwd = node.forward_nodes()
                self.enter_node = fwd[0] if node.forward else None

            if pe_id in self.exit_nodes:
                for b in node.backward_nodes():
                    self._add_exit(b)
                del self.exit_nodes[pe_id]

            backward_nodes = node.backward_nodes()
            forward_nodes = node.forward_nodes()
            for b in backward_nodes:
                for k in [k for k in b.forward if k[1] == pe_id]:
                    del b.forward[k]
            for f in forward_nodes:
                for k in [k for k in f.backward if k[0] == pe_id]:
                    del f.backward[k]
            node.forward.clear()
            node.backward.clear()
            for b in backward_nodes:
                for f in forward_nodes:
                    _add_edge(make_edge(b, f))

    # ------------------------------------------------- break/continue hooks

    def _connect_breaks(self, st: StatementInfo) -> None:
        """CFG.java:495-512."""
        remaining: List[CFGNode] = []
        for node in self.unhandled_breaks:
            label = node.core.get_jump_to_label()
            if label is None or label == st.label:
                self._add_exit(node)
            else:
                remaining.append(node)
        self.unhandled_breaks = remaining

    def _connect_continues(self, st: StatementInfo, dest: CFGNode) -> None:
        """CFG.java:518-539."""
        remaining: List[CFGNode] = []
        for node in self.unhandled_continues:
            label = node.core.get_jump_to_label()
            if label is None or label == st.label:
                _add_edge(make_edge(node, dest))
            else:
                remaining.append(node)
        self.unhandled_continues = remaining

    # --------------------------------------------------------- reachability

    def reachable_nodes(self, start: Optional[CFGNode] = None) -> Dict[int, CFGNode]:
        """CFG.java:597-633 (iterative)."""
        if start is None:
            start = self.enter_node
        out: Dict[int, CFGNode] = {}
        if start is None:
            return out
        stack = [start]
        while stack:
            n = stack.pop()
            if n.core.pe_id in out:
                continue
            out[n.core.pe_id] = n
            for child in reversed(n.forward_nodes()):
                if child.core.pe_id not in out:
                    stack.append(child)
        return out


def build_method_cfg(method: MethodInfo, idgen: IdGen,
                     factory: Optional[CFGNodeFactory] = None) -> CFG:
    if factory is None:
        factory = CFGNodeFactory(idgen)
    return CFG(method, factory).build()
