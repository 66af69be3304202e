"""Intra-method program-dependence graph builder.

Faithful re-expression of /root/reference .../pdg/PDG.java (cited lines).
Fixed configuration mirrors SavePDG (graphToDot/SavePDG.java:58-59): all
three edge families on; buildControlDependenceFromEnterToAllNodes=false,
...ToParameterNodes=false (PDG.java:84,88); treatMayDefAsDef=false,
treatMayUseAsUse=true (PDG.java:103,109).

Preserved subtleties:
- the def node itself is checked for a use of its own variable -> data
  self-loops (PDG.java:320-321);
- only an exact DEF kills propagation; MAY_DEF and DECLARE_AND_DEF pass
  through (PDG.java:404-429: ``varDefType.equals(VarDef.Type.DEF)``);
- the per-(def,start) DFS uses a fresh visited set, and a node first reached
  through a killing path is not revisited via a live path (visited-set
  semantics of the reference recursion);
- edge identity is (from, to, type) — a second data edge between the same
  nodes for a different variable is dropped (PDGEdge.compareTo,
  pdg/edge/PDGEdge.java:160-172); defs are iterated in sorted-name order to
  make the surviving label deterministic;
- CFG-unreachable nodes (catch bodies, dead code) still get dependence
  processing (PDG.java:285-292).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .cfg import CFG, CFGNode, K_CONTROL
from .pe import (D_DEF, D_MAY_DEF, ExpressionInfo, IdGen, MethodInfo, PE,
                 StatementInfo, U_MAY_USE, VariableDeclarationInfo)

# PDG node kinds
N_ENTER = "enter"
N_CONTROL = "control"
N_STATEMENT = "statement"
N_EXPRESSION = "expression"
N_PARAMETER = "parameter"


class PDGNode:
    __slots__ = ("core", "kind")

    def __init__(self, core: PE, kind: str):
        self.core = core
        self.kind = kind

    def __repr__(self):
        return f"<PDGNode {self.kind} #{self.core.pe_id} {self.core.text[:30]!r}>"


class PDGEdge:
    __slots__ = ("from_node", "to_node", "type_str", "label")

    def __init__(self, from_node: PDGNode, to_node: PDGNode,
                 type_str: str, label: str):
        self.from_node = from_node
        self.to_node = to_node
        self.type_str = type_str  # 'control' | 'data' | 'execution'
        self.label = label

    def key(self) -> Tuple[int, int, str]:
        return (self.from_node.core.pe_id, self.to_node.core.pe_id, self.type_str)


class PDGNodeFactory:
    """pdg/node/PDGNodeFactory.java — PE-keyed cache."""

    def __init__(self):
        self.map: Dict[int, PDGNode] = {}

    def make_node(self, cfg_node: CFGNode) -> PDGNode:
        if cfg_node.kind == K_CONTROL:
            return self.make_control_node(cfg_node.core)
        return self.make_normal_node(cfg_node.core)

    def make_control_node(self, element: PE) -> PDGNode:
        node = self.map.get(element.pe_id)
        if node is not None:
            return node
        node = PDGNode(element, N_CONTROL)
        self.map[element.pe_id] = node
        return node

    def make_normal_node(self, element: PE) -> PDGNode:
        node = self.map.get(element.pe_id)
        if node is not None:
            return node
        if isinstance(element, ExpressionInfo):
            node = PDGNode(element, N_EXPRESSION)
        elif isinstance(element, StatementInfo):
            node = PDGNode(element, N_STATEMENT)
        elif isinstance(element, VariableDeclarationInfo):
            node = PDGNode(element, N_PARAMETER)
        else:
            node = PDGNode(element, N_STATEMENT)
        self.map[element.pe_id] = node
        return node


class PDG:
    def __init__(self, unit: MethodInfo, cfg: CFG, idgen: IdGen):
        """The reference builds its own CFG inside PDG.build (PDG.java:215);
        passing the already-built CFG is semantically identical (fresh node
        factory per method, no PE sharing across methods) and halves work."""
        self.unit = unit
        self.cfg = cfg
        self._fwd_cache: Dict[int, List[CFGNode]] = {}
        self.factory = PDGNodeFactory()
        self.all_nodes: Dict[int, PDGNode] = {}
        self.edges: Dict[Tuple[int, int, str], PDGEdge] = {}
        self.exit_nodes: Dict[int, PDGNode] = {}

        # Fake Enter node: fresh MethodEnter PE (PDGMethodEnterNode.getInstance)
        enter_pe = ExpressionInfo(idgen, "MethodEnter", unit.start_line, unit.end_line)
        enter_pe.text = "Enter"
        self.enter_node = PDGNode(enter_pe, N_ENTER)
        self.factory.map[enter_pe.pe_id] = self.enter_node
        self._add_node(self.enter_node)

        self.parameter_nodes: List[PDGNode] = []
        for param in unit.parameters:
            p = self.factory.make_normal_node(param)
            self._add_node(p)
            self.parameter_nodes.append(p)

    # ------------------------------------------------------------- helpers

    def _add_node(self, n: PDGNode) -> None:
        self.all_nodes[n.core.pe_id] = n

    def _fwd(self, cfg_node: CFGNode) -> List[CFGNode]:
        """Sorted forward nodes, cached (the CFG is frozen during PDG build)."""
        got = self._fwd_cache.get(cfg_node.core.pe_id)
        if got is None:
            got = cfg_node.forward_nodes()
            self._fwd_cache[cfg_node.core.pe_id] = got
        return got

    def _add_edge(self, from_node: PDGNode, to_node: PDGNode,
                  type_str: str, label: str) -> None:
        e = PDGEdge(from_node, to_node, type_str, label)
        self.edges.setdefault(e.key(), e)

    def sorted_nodes(self) -> List[PDGNode]:
        return [self.all_nodes[k] for k in sorted(self.all_nodes)]

    def sorted_edges(self) -> List[PDGEdge]:
        return [self.edges[k] for k in sorted(self.edges)]

    # --------------------------------------------------------------- build

    def build(self) -> "PDG":
        cfg = self.cfg

        # Execution edge Enter -> CFG enter (PDG.java:238-247)
        if not cfg.is_empty():
            node = self.factory.make_node(cfg.enter_node)
            self._add_node(node)
            self._add_edge(self.enter_node, node, "execution", "")

        # Data deps for parameters (PDG.java:249-266)
        self.unit.get_def_variables()
        self.unit.get_use_variables()
        for p in self.parameter_nodes:
            if not cfg.is_empty():
                self._build_data_dependence(cfg.enter_node, p, p.core.name)
        for p in self.parameter_nodes:
            self._add_edge(self.enter_node, p, "data", p.core.name)

        # Dependence over reachable CFG (PDG.java:269-276)
        checked: set = set()
        if not cfg.is_empty():
            self._build_dependence_from(cfg.enter_node, checked)

        # PDG exits = CFG exits (PDG.java:278-283)
        for cfg_exit in cfg.exit_node_list():
            pdg_exit = self.factory.make_node(cfg_exit)
            self._add_node(pdg_exit)
            self.exit_nodes[pdg_exit.core.pe_id] = pdg_exit

        # Unreachable pass (PDG.java:285-292)
        if not cfg.is_empty():
            reachable = cfg.reachable_nodes()
            unreachable = [cfg.nodes[k] for k in sorted(cfg.nodes)
                           if k not in reachable]
            for node in unreachable:
                self._build_dependence_from(node, checked)
        return self

    # -------------------------------------------------- dependence walkers

    def _build_dependence_from(self, start: CFGNode, checked: set) -> None:
        """buildDependence (PDG.java:300-344), iterative preorder with
        sorted children (matches the reference recursion order)."""
        stack = [start]
        while stack:
            cfg_node = stack.pop()
            if cfg_node.core.pe_id in checked:
                continue
            checked.add(cfg_node.core.pe_id)

            pdg_node = self.factory.make_node(cfg_node)
            self._add_node(pdg_node)

            # data dependence, defs in sorted-name order for determinism
            defs = sorted(pdg_node.core.get_defs_at_least_may_def(),
                          key=lambda d: (d.main or ""))
            for d in defs:
                var = d.main
                if var is None:
                    continue
                # the def node itself is checked first (self-loop support)
                visited: set = set()
                self._data_dfs(cfg_node, pdg_node, var, visited)
                for to_node in self._fwd(cfg_node):
                    self._data_dfs(to_node, pdg_node, var, set())

            # control dependence (PDG.java:327-332)
            if pdg_node.kind in (N_CONTROL, N_ENTER):
                ocb = pdg_node.core.owner_conditional_block
                if ocb is not None:
                    self._build_control_dependence_block(pdg_node, ocb)

            # execution dependence (PDG.java:334-338)
            for to_cfg in self._fwd(cfg_node):
                to_pdg = self.factory.make_node(to_cfg)
                self._add_node(to_pdg)
                self._add_edge(pdg_node, to_pdg, "execution", "")

            for child in reversed(self._fwd(cfg_node)):
                if child.core.pe_id not in checked:
                    stack.append(child)

    def _data_dfs(self, start: CFGNode, from_pdg: PDGNode, variable: str,
                  visited: set) -> None:
        """buildDataDependence (PDG.java:354-430), iterative with the same
        visited-at-entry semantics and sorted-children order."""
        stack = [start]
        while stack:
            cfg_node = stack.pop()
            pid = cfg_node.core.pe_id
            if pid in visited:
                continue
            visited.add(pid)

            # use check (treatMayUseAsUse=true -> membership suffices)
            if variable in cfg_node.core.use_alias_index():
                to_pdg = self.factory.make_node(cfg_node)
                self._add_node(to_pdg)
                self._add_edge(from_pdg, to_pdg, "data", variable)

            # kill check: only exact DEF stops propagation (PDG.java:417)
            should_propagate = variable not in cfg_node.core.def_kill_index()

            if should_propagate:
                for child in reversed(self._fwd(cfg_node)):
                    if child.core.pe_id not in visited:
                        stack.append(child)

    def _build_data_dependence(self, start: CFGNode, from_pdg: PDGNode,
                               variable: str) -> None:
        self._data_dfs(start, from_pdg, variable, set())

    # ------------------------------------------------- control dependence

    def _build_control_dependence_block(self, from_pdg: PDGNode, block: PE) -> None:
        """buildControlDependence(block) (PDG.java:437-456)."""
        if isinstance(block, (StatementInfo, MethodInfo)):
            for st in block.statements:
                self._build_control_dependence_stmt(from_pdg, st, True)
        if isinstance(block, StatementInfo):
            for st in block.else_statements:
                self._build_control_dependence_stmt(from_pdg, st, False)
            for upd in block.updaters:
                to_pdg = self.factory.make_normal_node(upd)
                self._add_node(to_pdg)
                self._add_edge(from_pdg, to_pdg, "control", "true")

    def _build_control_dependence_stmt(self, from_pdg: PDGNode,
                                       st: StatementInfo, polarity: bool) -> None:
        """buildControlDependence(statement, type) (PDG.java:464-500)."""
        label = "true" if polarity else "false"
        cat = st.category
        if cat in ("Catch", "Do", "For", "Foreach", "If", "SimpleBlock",
                   "Synchronized", "Switch", "Try", "While"):
            condition = st.condition
            if condition is not None:
                to_pdg = self.factory.make_control_node(condition)
                self._add_node(to_pdg)
                self._add_edge(from_pdg, to_pdg, "control", label)
            else:
                self._build_control_dependence_block(from_pdg, st)
            for init in st.initializers:
                to_pdg = self.factory.make_normal_node(init)
                self._add_node(to_pdg)
                self._add_edge(from_pdg, to_pdg, "control", label)
        elif cat in ("Assert", "Break", "Case", "Continue", "Expression",
                     "Return", "Throw", "VariableDeclaration"):
            cfg_node = self.cfg.factory.get_node(st)
            if cfg_node is not None and cfg_node.core.pe_id in self.cfg.nodes:
                to_pdg = self.factory.make_normal_node(st)
                self._add_node(to_pdg)
                self._add_edge(from_pdg, to_pdg, "control", label)


def build_method_pdg(method: MethodInfo, cfg: CFG, idgen: IdGen) -> PDG:
    return PDG(method, cfg, idgen).build()
