"""Program-element (PE) model + def/use dataflow analysis.

Faithful re-expression of the reference data model (cited file:line refer to
/root/reference/src/main/java/com/tinypdg/...):

- ProgramElementInfo base with creation-order ids  (pe/ProgramElementInfo.java:27-122)
- StatementInfo (20 categories)                    (pe/StatementInfo.java:166-187)
- ExpressionInfo (29 categories)                   (pe/ExpressionInfo.java:83-114)
- MethodInfo / ClassInfo / VariableDeclarationInfo / TypeInfo / OperatorInfo
- Var / VarDef / VarUse lattices                   (pe/var/VarDef.java:29-40, VarUse.java:29-38)
- Scope chain + ScopeManager                       (pe/var/Scope.java, ScopeManager.java)
- def/use rules incl. method-name heuristics       (pe/ExpressionInfo.java:132-178, 262-442)
- field aliasing ("this." rename, uppercase excl.) (pe/StatementInfo.java:255-365)
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Tuple

# ----------------------------------------------------------------- lattices

# VarDef.Type levels (pe/var/VarDef.java:29-40)
D_UNKNOWN, D_NO_DEF, D_MAY_DEF, D_DEF, D_DECLARE, D_DECLARE_AND_DEF = range(6)
# VarUse.Type levels (pe/var/VarUse.java:29-38)
U_UNKNOWN, U_NO_USE, U_MAY_USE, U_USE = range(4)

TREAT_NON_LOCAL_VARIABLE_AS_FIELD = True   # ProgramElementInfo.java:82
TREAT_FIELD_EXCLUDE_UPPERCASE = True       # ProgramElementInfo.java:89


class NodeBudgetError(Exception):
    """Raised when a document exceeds its PE-node budget (runaway-doc
    guard — see IdGen)."""


class IdGen:
    """Per-document replacement for the reference's static AtomicInteger
    (ProgramElementInfo.java:32): creation order == visitation order, but
    scoped to one compilation unit so ids are a pure function of content.

    ``max_nodes`` is the runaway-doc guard (VERDICT r4 #8; precedent:
    the reference's own unused Config.maxNums=150, Config.java:7): a
    pathological document (50k-statement generated code inside the
    source-size cap) would otherwise monopolize one task through the
    per-method quadratic def/kill analysis. Every PE construction calls
    ``next()``, so raising here aborts the build at a single choke
    point; the extractor degrades the doc to an error row and the
    partition's other documents proceed."""

    __slots__ = ("n", "max_nodes")

    def __init__(self, max_nodes: "int | None" = None) -> None:
        self.n = 0
        self.max_nodes = max_nodes

    def next(self) -> int:
        if self.max_nodes is not None and self.n >= self.max_nodes:
            raise NodeBudgetError(
                f"node budget exceeded ({self.max_nodes})")
        v = self.n
        self.n += 1
        return v


class Var:
    """(scope, main name, alias set) triple (pe/var/Var.java)."""

    __slots__ = ("scope", "main", "aliases", "typ", "relevant_stmt")

    def __init__(self, scope: Optional["Scope"], main: str,
                 aliases: FrozenSet[str], typ: int,
                 relevant_stmt: Optional["PE"] = None) -> None:
        self.scope = scope
        self.main = main
        self.aliases = aliases
        self.typ = typ
        self.relevant_stmt = relevant_stmt

    def match_name(self, name: str) -> bool:  # Var.java:56-58
        return name in self.aliases

    def key(self) -> Tuple:
        # Set-equality key mirroring lombok @Data equality: scope (by block
        # identity), main name, aliases, type, relevant stmt (by identity).
        return (
            id(self.scope) if self.scope is not None else None,
            self.main,
            self.aliases,
            self.typ,
            id(self.relevant_stmt) if self.relevant_stmt is not None else None,
        )


class VarDef(Var):
    __slots__ = ()

    def promote(self, typ: int) -> "VarDef":  # VarDef.java:87-92
        if self.typ < typ:
            return VarDef(self.scope, self.main, self.aliases, typ, self.relevant_stmt)
        return VarDef(self.scope, self.main, self.aliases, self.typ, self.relevant_stmt)

    def update_scope(self) -> None:
        if self.scope is not None:
            self.scope.add_def_var(self)


class VarUse(Var):
    __slots__ = ()

    def promote(self, typ: int) -> "VarUse":
        if self.typ < typ:
            return VarUse(self.scope, self.main, self.aliases, typ, self.relevant_stmt)
        return VarUse(self.scope, self.main, self.aliases, self.typ, self.relevant_stmt)


class Scope:
    """Per-block variable scope with parent chain (pe/var/Scope.java)."""

    __slots__ = ("block", "parent", "def_alias_names")

    def __init__(self, block: "PE", parent: Optional["Scope"] = None) -> None:
        self.block = block
        self.parent = parent
        self.def_alias_names: set = set()

    def add_def_var(self, var: VarDef) -> None:
        self.def_alias_names.update(var.aliases)

    def has_variable_def(self, name: str) -> bool:  # Scope.java:62-67
        return name in self.def_alias_names

    def search_variable_def(self, name: str) -> Optional["Scope"]:  # Scope.java:75-86
        s: Optional[Scope] = self
        while s is not None:
            if s.has_variable_def(name):
                return s
            s = s.parent
        return None


class ScopeManager:
    """Block PE -> Scope memo building the parent chain from
    StatementInfo.ownerBlock (pe/var/ScopeManager.java:33-46)."""

    __slots__ = ("_scopes",)

    def __init__(self) -> None:
        self._scopes: Dict[int, Scope] = {}

    def get_scope(self, block: "PE") -> Scope:
        key = id(block)
        got = self._scopes.get(key)
        if got is not None:
            return got
        scope = Scope(block)
        self._scopes[key] = scope
        if isinstance(block, StatementInfo):
            parent_block = block.owner_block
            if parent_block is not None and parent_block is not block:
                scope.parent = self.get_scope(parent_block)
        return scope


# ------------------------------------------------------------ PE hierarchy


class PE:
    """ProgramElementInfo (pe/ProgramElementInfo.java)."""

    __slots__ = ("pe_id", "start_line", "end_line", "text", "modifiers",
                 "owner_conditional_block", "_defs", "_uses",
                 "_use_alias_idx", "_def_kill_idx")

    is_block = False  # BlockInfo marker

    def __init__(self, idgen: IdGen, start_line: int, end_line: int) -> None:
        self.pe_id = idgen.next()
        self.start_line = start_line
        self.end_line = end_line
        self.text = ""
        self.modifiers: List[str] = []
        self.owner_conditional_block: Optional[PE] = None
        self._defs: Optional[Dict[Tuple, VarDef]] = None
        self._uses: Optional[Dict[Tuple, VarUse]] = None
        self._use_alias_idx: Optional[frozenset] = None
        self._def_kill_idx: Optional[frozenset] = None

    # --- def/use memoization (ProgramElementInfo.java:137-186) ---

    def get_def_variables(self) -> List[VarDef]:
        if self._defs is None:
            self._defs = {}
            self._calc_defs()
        return list(self._defs.values())

    def get_defs_at_least_may_def(self) -> List[VarDef]:
        return [d for d in self.get_def_variables() if d.typ >= D_MAY_DEF]

    def get_use_variables(self) -> List[VarUse]:
        if self._uses is None:
            self._uses = {}
            self._calc_uses()
        return list(self._uses.values())

    def get_uses_at_least_may_use(self) -> List[VarUse]:
        return [u for u in self.get_use_variables() if u.typ >= U_MAY_USE]

    # --- hot-path indexes for the PDG data-dependence DFS ---

    def use_alias_index(self) -> frozenset:
        """All aliases across uses >= MAY_USE (the PDG use-match is a pure
        membership test given treatMayUseAsUse=true, PDG.java:371-390)."""
        if self._use_alias_idx is None:
            names: set = set()
            for u in self.get_uses_at_least_may_use():
                names.update(u.aliases)
            self._use_alias_idx = frozenset(names)
        return self._use_alias_idx

    def def_kill_index(self) -> frozenset:
        """Aliases of defs at exactly DEF level — the only level that stops
        data-dep propagation (PDG.java:404-429)."""
        if self._def_kill_idx is None:
            names: set = set()
            for d in self.get_defs_at_least_may_def():
                if d.typ == D_DEF:
                    names.update(d.aliases)
            self._def_kill_idx = frozenset(names)
        return self._def_kill_idx

    def add_var_def(self, var_def: VarDef) -> None:
        d = VarDef(var_def.scope, var_def.main, var_def.aliases, var_def.typ,
                   var_def.relevant_stmt)
        self._defs.setdefault(d.key(), d)

    def add_var_use(self, var_use: VarUse) -> None:
        u = VarUse(var_use.scope, var_use.main, var_use.aliases, var_use.typ,
                   var_use.relevant_stmt)
        self._uses.setdefault(u.key(), u)

    def _calc_defs(self) -> None:  # override in subclasses
        pass

    def _calc_uses(self) -> None:
        pass

    def __repr__(self) -> str:
        return f"<{type(self).__name__} #{self.pe_id} {self.text[:40]!r}>"


class PseudoElement(PE):
    """CFGPseudoNode.PseudoElement (cfg/node/CFGPseudoNode.java:24-31)."""

    __slots__ = ()

    def __init__(self, idgen: IdGen) -> None:
        super().__init__(idgen, 0, 0)


class TypeInfo(PE):
    __slots__ = ()

    def __init__(self, idgen: IdGen, text: str, start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        self.text = text


class OperatorInfo(PE):
    __slots__ = ("token",)

    def __init__(self, idgen: IdGen, token: str, start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        self.token = token
        self.text = token


class ClassInfo(PE):
    __slots__ = ("name", "methods")

    def __init__(self, idgen: IdGen, name: Optional[str], start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        self.name = name
        self.methods: List["MethodInfo"] = []


class VariableDeclarationInfo(PE):
    """pe/VariableDeclarationInfo.java"""

    __slots__ = ("category", "type_info", "name")

    FIELD, LOCAL, PARAMETER = "FIELD", "LOCAL", "PARAMETER"

    def __init__(self, idgen: IdGen, category: str, type_info: TypeInfo,
                 name: str, start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        self.category = category
        self.type_info = type_info
        self.name = name

    def _calc_defs(self) -> None:  # VariableDeclarationInfo.java:61-64
        d = VarDef(None, self.name, frozenset((self.name,)), D_DECLARE)
        self._defs.setdefault(d.key(), d)


# Expression categories (pe/ExpressionInfo.java:83-114)
EXPR_CATEGORIES = frozenset(
    """ArrayAccess ArrayCreation ArrayInitializer Assignment Boolean Cast
    Character ClassInstanceCreation ConstructorInvocation FieldAccess Infix
    Instanceof MethodInvocation Null Number Parenthesized Postfix Prefix
    QualifiedName SimpleName String SuperConstructorInvocation
    SuperFieldAccess SuperMethodInvocation This Trinomial TypeLiteral
    VariableDeclarationExpression VariableDeclarationFragment MethodEnter""".split()
)

# Method-name def heuristics (pe/ExpressionInfo.java:132-146)
_NO_DEF_METHOD_NAMES = ("equals", "hashCode", "toString", "isEmpty", "size",
                        "length", "stream")
_DEF_METHOD_NAMES = ("push", "pop", "offer", "poll")
_NO_DEF_METHOD_PREFIXES = ("get", "print", "debug", "trace", "info", "warn",
                           "error")
_DEF_METHOD_PREFIXES = ("set", "add", "remove", "put", "insert", "contains")


def judge_method_may_def_base(method_name: str) -> int:
    """pe/ExpressionInfo.java:156-178 (exact order: names, def-names,
    no-def prefixes, def prefixes, else MAY_DEF)."""
    for n in _NO_DEF_METHOD_NAMES:
        if method_name == n:
            return D_NO_DEF
    for n in _DEF_METHOD_NAMES:
        if method_name == n:
            return D_DEF
    for p in _NO_DEF_METHOD_PREFIXES:
        if method_name.startswith(p):
            return D_NO_DEF
    for p in _DEF_METHOD_PREFIXES:
        if method_name.startswith(p):
            return D_DEF
    return D_MAY_DEF


def get_variable_name_aliases(pe: PE) -> Dict[str, FrozenSet[str]]:
    """Variable-shape recognition (pe/ExpressionInfo.java:194-260).
    Returns {main_name: alias_set} or {} if pe is not a variable."""
    if not isinstance(pe, ExpressionInfo):
        return {}
    cat = pe.category
    text = pe.text
    if cat == "SimpleName":
        return {text: frozenset((text,))}
    if cat == "ArrayAccess":
        if pe.expressions:
            base = pe.expressions[0]
            if isinstance(base, ExpressionInfo) and base.category == "SimpleName":
                return {base.text: frozenset((base.text,))}
        return {}
    if cat == "FieldAccess":
        if len(pe.expressions) == 2:
            base = pe.expressions[0]
            if isinstance(base, ExpressionInfo):
                if base.category == "SimpleName":
                    return {text: frozenset((text,)),
                            base.text: frozenset((base.text,))}
                if base.category == "This":
                    if TREAT_NON_LOCAL_VARIABLE_AS_FIELD:
                        return {text: frozenset((text,))}
                    field_text = pe.expressions[1].text
                    return {text: frozenset((text, field_text))}
        return {}
    if cat == "QualifiedName":
        if pe.expressions:
            base = pe.qualifier
            if isinstance(base, ExpressionInfo) and base.category == "SimpleName":
                return {text: frozenset((text,)),
                        base.text: frozenset((base.text,))}
        return {}
    return {}


class ExpressionInfo(PE):
    """pe/ExpressionInfo.java"""

    __slots__ = ("category", "qualifier", "expressions",
                 "anonymous_class_declaration", "api_name")

    def __init__(self, idgen: IdGen, category: str, start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        assert category in EXPR_CATEGORIES, category
        self.category = category
        self.qualifier: Optional[PE] = None
        self.expressions: List[PE] = []
        self.anonymous_class_declaration: Optional[ClassInfo] = None
        self.api_name: Optional[str] = None

    def add_expression(self, e: PE) -> None:
        self.expressions.append(e)

    # --- defs (pe/ExpressionInfo.java:262-377) ---
    def _calc_defs(self) -> None:
        cat = self.category
        exprs = self.expressions
        if cat == "Assignment":
            if len(exprs) == 3:
                left = exprs[0]
                amap = get_variable_name_aliases(left)
                if amap:
                    for main, aliases in amap.items():
                        self.add_var_def(VarDef(None, main, aliases, D_DEF))
                else:
                    for d in left.get_def_variables():
                        self.add_var_def(d)
                for d in exprs[2].get_def_variables():
                    self.add_var_def(d)
        elif cat == "VariableDeclarationFragment":
            if len(exprs) == 2:
                left = exprs[0]
                amap = get_variable_name_aliases(left)
                if amap:
                    for main, aliases in amap.items():
                        self.add_var_def(VarDef(None, main, aliases, D_DECLARE_AND_DEF))
                else:
                    for d in left.get_def_variables():
                        self.add_var_def(d)
                for d in exprs[1].get_def_variables():
                    self.add_var_def(d)
        elif cat == "Postfix":
            if len(exprs) == 2:
                amap = get_variable_name_aliases(exprs[0])
                if amap:
                    for main, aliases in amap.items():
                        self.add_var_def(VarDef(None, main, aliases, D_DEF))
                else:
                    for d in exprs[0].get_def_variables():
                        self.add_var_def(d)
        elif cat == "Prefix":
            if len(exprs) == 2 and isinstance(exprs[0], OperatorInfo):
                operand = exprs[1]
                amap = get_variable_name_aliases(operand)
                if amap and exprs[0].token in ("++", "--"):
                    for main, aliases in amap.items():
                        self.add_var_def(VarDef(None, main, aliases, D_DEF))
                else:
                    for d in operand.get_def_variables():
                        self.add_var_def(d)
        elif cat == "MethodInvocation":
            # params are deliberately NOT defs (ExpressionInfo.java:331-333)
            if self.qualifier is not None and exprs:
                call_def_type = judge_method_may_def_base(exprs[0].text)
                amap = get_variable_name_aliases(self.qualifier)
                if amap:
                    for main, aliases in amap.items():
                        self.add_var_def(VarDef(None, main, aliases, call_def_type))
                else:
                    if call_def_type >= D_MAY_DEF:
                        # chained receiver: promote inner defs to >= MAY_DEF
                        # (ExpressionInfo.java:348-363)
                        for d in self.qualifier.get_def_variables():
                            self.add_var_def(d.promote(D_MAY_DEF))
                    else:
                        for d in self.qualifier.get_def_variables():
                            self.add_var_def(d)
        else:
            for e in exprs:
                for d in e.get_def_variables():
                    self.add_var_def(d)
            if self.anonymous_class_declaration is not None:
                for m in self.anonymous_class_declaration.methods:
                    for d in m.get_def_variables():
                        self.add_var_def(d)

    # --- uses (pe/ExpressionInfo.java:379-442) ---
    def _calc_uses(self) -> None:
        cat = self.category
        exprs = self.expressions
        if cat == "Assignment":
            if len(exprs) == 3:
                for u in exprs[2].get_use_variables():
                    self.add_var_use(u.promote(U_USE))
        elif cat == "VariableDeclarationFragment":
            if len(exprs) == 2:
                for u in exprs[1].get_use_variables():
                    self.add_var_use(u.promote(U_USE))
        elif cat in ("Postfix", "Prefix"):
            for e in exprs:
                for u in e.get_use_variables():
                    self.add_var_use(u.promote(U_USE))
        elif cat == "SimpleName":
            u = VarUse(None, self.text, frozenset((self.text,)), U_MAY_USE)
            self._uses.setdefault(u.key(), u)
        elif cat == "MethodInvocation":
            if self.qualifier is not None:
                for u in self.qualifier.get_use_variables():
                    self.add_var_use(u)
            for e in exprs[1:]:  # exprs[0] is the method name
                for u in e.get_use_variables():
                    self.add_var_use(u)
        else:
            amap = get_variable_name_aliases(self)
            if amap:
                for main, aliases in amap.items():
                    self.add_var_use(VarUse(None, main, aliases, U_MAY_USE))
            else:
                for e in exprs:
                    for u in e.get_use_variables():
                        self.add_var_use(u)
                if self.anonymous_class_declaration is not None:
                    for m in self.anonymous_class_declaration.methods:
                        for u in m.get_use_variables():
                            self.add_var_use(u)


# Statement categories (pe/StatementInfo.java:166-187)
STMT_CATEGORIES = frozenset(
    """Assert Break Case Catch Continue Do Empty Expression If For Foreach
    Return SimpleBlock Synchronized Switch Throw Try TypeDeclaration
    VariableDeclaration While""".split()
)


def _this_rename(main: Optional[str], aliases: FrozenSet[str]
                 ) -> Tuple[Optional[str], FrozenSet[str]]:
    """Field aliasing rule (StatementInfo.java:286-298, :341-352)."""
    if main and TREAT_NON_LOCAL_VARIABLE_AS_FIELD:
        if not TREAT_FIELD_EXCLUDE_UPPERCASE or not main[:1].isupper():
            if not main.startswith("this."):
                with_this = "this." + main
                return with_this, frozenset((main, with_this))
    return main, aliases


class StatementInfo(PE):
    """pe/StatementInfo.java"""

    __slots__ = ("scope_manager", "owner_block", "category", "condition",
                 "expressions", "initializers", "updaters", "statements",
                 "else_statements", "catch_statements", "finally_statement",
                 "label")

    is_block = True

    def __init__(self, idgen: IdGen, scope_manager: ScopeManager,
                 owner_block: Optional[PE], category: str,
                 start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        assert category in STMT_CATEGORIES, category
        self.scope_manager = scope_manager
        self.owner_block = owner_block
        self.category = category
        self.condition: Optional[PE] = None
        self.expressions: List[PE] = []
        self.initializers: List[PE] = []
        self.updaters: List[PE] = []
        self.statements: List["StatementInfo"] = []
        self.else_statements: List["StatementInfo"] = []
        self.catch_statements: List["StatementInfo"] = []
        self.finally_statement: Optional["StatementInfo"] = None
        self.label: Optional[str] = None

    # --- structure (StatementInfo.java:189-248) ---
    def add_expression(self, e: PE) -> None:
        self.expressions.append(e)

    def add_initializer(self, e: PE) -> None:
        self.initializers.append(e)

    def add_updater(self, e: PE) -> None:
        self.updaters.append(e)

    def set_statement(self, statement: "StatementInfo") -> None:
        # SimpleBlock flattening (StatementInfo.java:204-217)
        self.statements = []
        if statement.category == "SimpleBlock":
            if not statement.statements:
                self.statements.append(statement)
            else:
                self.statements.extend(statement.statements)
        else:
            self.statements.append(statement)

    def add_statement(self, statement: "StatementInfo") -> None:
        self.statements.append(statement)

    def set_else_statement(self, else_body: "StatementInfo") -> None:
        # StatementInfo.java:225-233 (note: empty SimpleBlock -> empty list)
        self.else_statements = []
        if else_body.category == "SimpleBlock":
            self.else_statements.extend(else_body.statements)
        else:
            self.else_statements.append(else_body)

    def add_catch_statement(self, c: "StatementInfo") -> None:
        self.catch_statements.append(c)

    def get_jump_to_label(self) -> Optional[str]:  # StatementInfo.java:152-161
        if self.category not in ("Break", "Continue"):
            return None
        if not self.expressions:
            return None
        return self.expressions[0].text

    # --- scope attach for defs/uses (StatementInfo.java:255-365) ---
    def add_var_def(self, var_def: VarDef) -> None:
        def_scope = var_def.scope
        main = var_def.main
        aliases = var_def.aliases
        typ = var_def.typ
        relevant = var_def.relevant_stmt

        our_scope = self.scope_manager.get_scope(self.owner_block)
        if var_def.scope is None:
            if typ >= D_DECLARE:
                def_scope = our_scope
            else:
                matched = our_scope.search_variable_def(main)
                def_scope = matched  # may be None (this.xxx def)

        if def_scope is None:
            main, aliases = _this_rename(main, aliases)

        if relevant is None:
            relevant = self

        d = VarDef(def_scope, main, aliases, typ, relevant)
        if def_scope is not None:
            d.update_scope()
        self._defs.setdefault(d.key(), d)

    def add_var_use(self, var_use: VarUse) -> None:
        use_scope = var_use.scope
        main = var_use.main
        aliases = var_use.aliases
        typ = var_use.typ
        relevant = var_use.relevant_stmt

        our_scope = self.scope_manager.get_scope(self.owner_block)
        if var_use.scope is None:
            use_scope = our_scope.search_variable_def(main)

        if use_scope is None:
            main, aliases = _this_rename(main, aliases)

        if relevant is None:
            relevant = self

        u = VarUse(use_scope, main, aliases, typ, relevant)
        self._uses.setdefault(u.key(), u)

    # --- aggregation (StatementInfo.java:367-435) ---
    def _calc_defs(self) -> None:
        for e in self.expressions:
            for d in e.get_def_variables():
                self.add_var_def(d)
        for e in self.initializers:
            for d in e.get_def_variables():
                self.add_var_def(d)
        if self.condition is not None:
            for d in self.condition.get_def_variables():
                self.add_var_def(d)
        for e in self.updaters:
            for d in e.get_def_variables():
                self.add_var_def(d)
        for s in self.statements:
            for d in s.get_def_variables():
                self.add_var_def(d)
        for s in self.else_statements:
            for d in s.get_def_variables():
                self.add_var_def(d)
        for s in self.catch_statements:
            for d in s.get_def_variables():
                self.add_var_def(d)
        if self.finally_statement is not None:
            for d in self.finally_statement.get_def_variables():
                self.add_var_def(d)

    def _calc_uses(self) -> None:
        for e in self.expressions:
            for u in e.get_use_variables():
                self.add_var_use(u)
        for e in self.initializers:
            for u in e.get_use_variables():
                self.add_var_use(u)
        if self.condition is not None:
            for u in self.condition.get_use_variables():
                self.add_var_use(u)
        for e in self.updaters:
            for u in e.get_use_variables():
                self.add_var_use(u)
        for s in self.statements:
            for u in s.get_use_variables():
                self.add_var_use(u)
        for s in self.else_statements:
            for u in s.get_use_variables():
                self.add_var_use(u)
        for s in self.catch_statements:
            for u in s.get_use_variables():
                self.add_var_use(u)
        if self.finally_statement is not None:
            for u in self.finally_statement.get_use_variables():
                self.add_var_use(u)


class MethodInfo(PE):
    """pe/MethodInfo.java"""

    __slots__ = ("scope_manager", "lambda_", "lambda_expression", "name",
                 "parameters", "statements")

    is_block = True

    def __init__(self, idgen: IdGen, scope_manager: ScopeManager,
                 lambda_: bool, name: Optional[str],
                 start_line: int, end_line: int) -> None:
        super().__init__(idgen, start_line, end_line)
        self.scope_manager = scope_manager
        self.lambda_ = lambda_
        self.lambda_expression: Optional[ExpressionInfo] = None
        self.name = name
        self.parameters: List[VariableDeclarationInfo] = []
        self.statements: List[StatementInfo] = []

    def add_parameter(self, p: VariableDeclarationInfo) -> None:
        self.parameters.append(p)

    def set_statement(self, statement: StatementInfo) -> None:
        # MethodInfo.java:88-97 (note: empty SimpleBlock -> empty list,
        # unlike StatementInfo.setStatement)
        self.statements = []
        if statement.category == "SimpleBlock":
            self.statements.extend(statement.statements)
        else:
            self.statements.append(statement)

    def add_statement(self, statement: StatementInfo) -> None:
        self.statements.append(statement)

    def _calc_defs(self) -> None:  # MethodInfo.java:114-131
        method_scope = self.scope_manager.get_scope(self)
        for p in self.parameters:
            for pd in p.get_def_variables():
                d = VarDef(method_scope, pd.main, pd.aliases, pd.typ)
                d.update_scope()
                self.add_var_def(d)
        for s in self.statements:
            for d in s.get_def_variables():
                self.add_var_def(d)
        if self.lambda_ and self.lambda_expression is not None:
            for d in self.lambda_expression.get_def_variables():
                self.add_var_def(d)

    def _calc_uses(self) -> None:  # MethodInfo.java:133-141
        for s in self.statements:
            for u in s.get_use_variables():
                self.add_var_use(u)
        if self.lambda_ and self.lambda_expression is not None:
            for u in self.lambda_expression.get_use_variables():
                self.add_var_use(u)
