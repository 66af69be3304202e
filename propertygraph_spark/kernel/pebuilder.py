"""JAST -> PE tree builder.

Replicates PEASTVisitor (/root/reference .../ast/PEASTVisitor.java) exactly:
- PE creation order (ids are creation-ordered, ProgramElementInfo.java:96);
- text rendering rules (load-bearing: node identity in the reference output
  is the rendered text + line span, cfg/node/CFGNode.java:175-188);
- graceful drops of unsupported subtrees (PESafeStack.java:35-60) — JAST
  ``Unknown`` nodes build to None and are skipped exactly like a failed pop.

Line-number rules (PEASTVisitor.java:113-153): start = line of first char;
end = line of exclusive end offset, EXCEPT If (else start - 1 when else
exists) and Try (first catch start - 1, else finally block start - 1).
"""

from __future__ import annotations

from typing import List, Optional

from .javaparser import J, parse_java
from .lexer import LineMap, translate_unicode_escapes, unescape_java
from .pe import (ClassInfo, ExpressionInfo, IdGen, MethodInfo, OperatorInfo,
                 PE, ScopeManager, StatementInfo, TypeInfo,
                 VariableDeclarationInfo)

NL = "\n"  # reference uses System.lineSeparator(); we fix '\n'

import re

_IDENT_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*\Z")

# java.lang types a JDT binding would qualify implicitly (JLS §7.3: every
# compilation unit imports java.lang.*). Only the hot, unambiguous names —
# an application class reusing one of these would be shadowed by an
# explicit import or a same-unit declaration, both checked first.
# DOCUMENTED APPROXIMATION (ADVICE r3): a type reached only through a
# wildcard import (`import pkg.*;`) or a same-package class in ANOTHER
# file is invisible without a classpath, so an application class named
# e.g. Process or Error arriving that way is mis-qualified to
# java.lang.* — the reference's JDT binding (PEASTVisitor.java:1021)
# would resolve the true type. Guarded by a regression test
# (tests/test_java_constructs.py::test_wildcard_import_shadowing_limit);
# the corpus-level symbol table (pipeline/linking.py) closes the
# same-CORPUS slice of this gap at the pipeline layer.
_JAVA_LANG = frozenset((
    "String Object Integer Long Double Float Short Byte Character Boolean "
    "Math System Thread Runtime StringBuilder StringBuffer Class Enum "
    "Number Void Iterable Comparable CharSequence Runnable Process "
    "ProcessBuilder Exception RuntimeException Error Throwable "
    "IllegalArgumentException IllegalStateException NullPointerException "
    "IndexOutOfBoundsException ArithmeticException ClassCastException "
    "NumberFormatException UnsupportedOperationException "
    "InterruptedException CloneNotSupportedException").split())


class PEBuilder:
    def __init__(self, source: str, max_nodes: "int | None" = None):
        # JLS §3.3: unicode escapes decode BEFORE lexing (JDT scanner
        # semantics): an escaped letter inside an identifier or keyword
        # still lexes as that identifier/keyword. Offsets/line numbers
        # refer to the translated source (documented deviation: an escape
        # earlier on the same line shifts later columns; line numbers only
        # move if the escape encodes a line terminator).
        source = translate_unicode_escapes(source)
        self.src = source
        self.lines = LineMap(source)
        self.idgen = IdGen(max_nodes)
        self.scope_manager = ScopeManager()
        self.methods: List[MethodInfo] = []
        self.imports: dict = {}  # simple name -> fqn (single-type imports)
        # every TypeDeclaration in this compilation unit (incl. nested),
        # by simple name: extends-chain receiver resolution + same-unit
        # static-receiver package qualification
        self.unit_types: dict = {}
        self.package = ""  # set by build() from the compilation unit
        # class/field declaration mention seeds collected while building:
        # (node_id, mention, kind, candidate) — north_star mention
        # families beyond method decls + call sites. Fields stay OUT of
        # the PE tree (projection parity) but their declarations are
        # still mentions worth linking.
        self.mention_seeds: List[tuple] = []
        # innermost-class field scopes ('this.x' binds to the FIELD even
        # when a local/param shadows it — JDT field binding semantics)
        self.class_envs: List[dict] = []
        # innermost-class method return types: same-class chained-call
        # receivers like make().spin() resolve through make()'s declared
        # return type (the static slice of JDT method bindings reachable
        # without a classpath)
        self.method_return_envs: List[dict] = []
        # declared-type environment: a stack of {var name -> base type}
        # scopes (class fields, method params, block/for/foreach/catch
        # locals). The static stand-in for JDT variable bindings: a call
        # through a declared receiver resolves apiName via the receiver's
        # TYPE (ExpressionInfo.java:66-70, PEASTVisitor.java:1017-1025),
        # so `T x; x.m()` yields `pkg.T.m()` when pkg.T is imported.
        self.type_env: List[dict] = []

    # ------------------------------------------------------- type tracking

    @staticmethod
    def _base_type(type_text: str) -> str:
        """Erase generics/array suffixes: List<Map<K,V>>[] -> List."""
        for cut in ("<", "["):
            idx = type_text.find(cut)
            if idx != -1:
                type_text = type_text[:idx]
        return type_text.strip()

    def _push_env(self) -> None:
        self.type_env.append({})

    def _pop_env(self) -> None:
        if self.type_env:
            self.type_env.pop()

    def _declare_type(self, name: Optional[str], type_text: Optional[str]) -> None:
        if name and type_text and self.type_env:
            self.type_env[-1][name] = self._base_type(type_text)

    def _lookup_type(self, name: str) -> Optional[str]:
        for env in reversed(self.type_env):
            t = env.get(name)
            if t is not None:
                return t
        return None

    def _enter_class_scope(self, body, seed_node_id: Optional[int],
                           superclass: Optional[str] = None) -> None:
        """Shared class/anonymous-class entry: push a field scope +
        method-return table from the member list (fields visible to every
        method regardless of order; same-class chained calls resolve via
        return types). ``seed_node_id`` set -> field_decl mention seeds
        are emitted (named classes only).

        ``superclass`` walks the same-compilation-unit extends chain
        (JDT bindings resolve inherited receivers, ExpressionInfo.java:
        66-70; without a classpath only same-file ancestors are visible):
        ancestor fields/return types are added where the subclass doesn't
        shadow them. Inherited members emit NO mention seeds — they are
        not declarations of this class."""
        self._push_env()
        self.class_envs.append(self.type_env[-1])
        returns: dict = {}
        for member in body:
            if member.t == "FieldDeclaration":
                base = self._base_type(member["type"]["text"])
                for name in member["names"]:
                    self._declare_type(name, member["type"]["text"])
                    if seed_node_id is not None:
                        self.mention_seeds.append(
                            (seed_node_id, name, "field_decl",
                             f"{base}.{name}"))
            elif member.t == "MethodDeclaration" \
                    and member.get("return_type") is not None:
                rt = self._base_type(member["return_type"]["text"])
                if rt and rt not in ("void", "var"):
                    returns[member["name"]] = rt
        env = self.type_env[-1]
        seen: set = set()
        sup = superclass
        while sup is not None:
            base = self._base_type(sup)
            if base in seen:
                break  # malformed cycle: never loop
            seen.add(base)
            td = self.unit_types.get(base)
            if td is None:
                break  # ancestor not in this compilation unit
            for member in td["body"]:
                if member.t == "FieldDeclaration":
                    for name in member["names"]:
                        if name not in env:
                            env[name] = self._base_type(
                                member["type"]["text"])
                elif member.t == "MethodDeclaration" \
                        and member.get("return_type") is not None:
                    rt = self._base_type(member["return_type"]["text"])
                    if rt and rt not in ("void", "var") \
                            and member["name"] not in returns:
                        returns[member["name"]] = rt
            sup = td.get("superclass")
        self.method_return_envs.append(returns)

    def _exit_class_scope(self) -> None:
        self._pop_env()
        self.class_envs.pop()
        self.method_return_envs.pop()

    # ---------------------------------------------------------- line rules

    def _sl(self, j: J) -> int:
        return self.lines.line_of(j.start)

    def _el(self, j: J) -> int:
        if j.t == "If":
            if j["else_stmt"] is not None:
                return self.lines.line_of(j["else_start"] - 1)
            return self.lines.line_of(j.end)
        if j.t == "Try":
            if j["first_catch_start"] is not None:
                return self.lines.line_of(j["first_catch_start"] - 1)
            if j["finally_block_start"] is not None:
                return self.lines.line_of(j["finally_block_start"] - 1)
            return self.lines.line_of(j.end)
        return self.lines.line_of(j.end)

    # ------------------------------------------------------------ top level

    def build(self) -> List[MethodInfo]:
        unit = parse_java(self.src)
        self.package = unit.get("package", "")
        for path in unit.get("imports", []):
            simple = path.rsplit(".", 1)[-1]
            self.imports.setdefault(simple, path)

        def scan(tds):
            for td in tds:
                if td.t != "TypeDeclaration":
                    continue
                self.unit_types.setdefault(td["name"], td)
                scan(m for m in td["body"] if m.t == "TypeDeclaration")
        scan(unit["types"])
        for td in unit["types"]:
            self.build_type_declaration(td)
        return self.methods

    def build_type_declaration(self, j: J) -> ClassInfo:
        """PEASTVisitor.java:177-205 (methods land in self.methods)."""
        cls = ClassInfo(self.idgen, j["name"], self._sl(j), self._el(j))
        fqn = f"{self.package}.{j['name']}" if self.package else j["name"]
        self.mention_seeds.append(
            (cls.pe_id, j["name"], "class_decl", fqn))
        # class-level type scope: field types are visible to every method
        # regardless of declaration order (fields themselves stay dropped
        # from the PE tree — projection P2)
        self._enter_class_scope(j["body"], seed_node_id=cls.pe_id,
                                superclass=j.get("superclass"))
        text = ["class ", j["name"], "{", NL]
        for member in j["body"]:
            if member.t == "MethodDeclaration":
                m = self.build_method_declaration(member)
                if m is not None:
                    self.methods.append(m)
                    cls.methods.append(m)
                    text.append(m.text)
                    text.append(NL)
        text.append("}")
        cls.text = "".join(text)
        self._exit_class_scope()
        return cls

    def build_method_declaration(self, j: J) -> Optional[MethodInfo]:
        """PEASTVisitor.java:260-302."""
        method = MethodInfo(self.idgen, self.scope_manager, False, j["name"],
                            self._sl(j), self._el(j))
        self._push_env()  # method scope: params + body locals
        text: List[str] = []
        for mod in j["modifiers"]:
            method.modifiers.append(mod)
            text.append(mod)
            text.append(" ")
        if j["return_type"] is not None:
            text.append(j["return_type"]["text"])
            text.append(" ")
        text.append(j["name"])
        text.append(" (")
        for p in j["params"]:
            param = self.build_single_variable_declaration(p)
            if param is not None:
                param.category = VariableDeclarationInfo.PARAMETER
                method.add_parameter(param)
                text.append(param.text)
                text.append(",")
        if text and text[-1] == ",":
            text.pop()
        text.append(") ")
        if j["body"] is not None:
            body = self.build_statement(j["body"], method)
            if body is not None:
                method.set_statement(body)
                text.append(body.text)
        method.text = "".join(text)
        self._pop_env()
        return method

    def build_single_variable_declaration(self, j: J) -> Optional[VariableDeclarationInfo]:
        """PEASTVisitor.java:1760-1791 (TypeInfo id precedes the var id)."""
        sl, el = self._sl(j), self._el(j)
        self._declare_type(j["name"], j["type"]["text"])
        type_info = TypeInfo(self.idgen, j["type"]["text"], sl, el)
        var = VariableDeclarationInfo(self.idgen, VariableDeclarationInfo.LOCAL,
                                      type_info, j["name"], sl, el)
        text: List[str] = []
        for mod in j["modifiers"]:
            var.modifiers.append(mod)
            text.append(mod)
            text.append(" ")
        if j.get("in_catch"):
            text.extend(("catch ( ", type_info.text, " ", j["name"], " )"))
        else:
            text.extend((type_info.text, " ", j["name"]))
        var.text = "".join(text)
        return var

    # ----------------------------------------------------------- statements

    def build_statement(self, j: J, owner: PE) -> Optional[StatementInfo]:
        handler = getattr(self, "_st_" + j.t, None)
        if handler is None:
            return None
        return handler(j, owner)

    def _new_stmt(self, j: J, owner: PE, category: str) -> StatementInfo:
        return StatementInfo(self.idgen, self.scope_manager, owner, category,
                             self._sl(j), self._el(j))

    def _st_Block(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:1697-1723."""
        blk = self._new_stmt(j, owner, "SimpleBlock")
        self._push_env()
        text = ["{", NL]
        for s in j["statements"]:
            st = self.build_statement(s, blk)
            if st is not None:
                blk.add_statement(st)
                text.append(st.text)
                text.append(NL)
        text.append("}")
        blk.text = "".join(text)
        self._pop_env()
        return blk

    def _st_Empty(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Empty")
        st.text = ";"
        return st

    def _st_ExpressionStatement(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Expression")
        expr = self.build_expression(j["expr"])
        if expr is not None:
            st.add_expression(expr)
            st.text = expr.text + ";"
        return st

    def _st_ConstructorInvocation(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:894-930 (invocation expr id precedes stmt id)."""
        sl, el = self._sl(j), self.lines.line_of(j.get("stmt_end", j.end))
        inv = ExpressionInfo(self.idgen, "ConstructorInvocation", sl, el)
        text = ["this("]
        for a in j["args"]:
            ae = self.build_expression(a)
            if ae is not None:
                inv.add_expression(ae)
                text.append(ae.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append(")")
        inv.text = "".join(text)
        st = StatementInfo(self.idgen, self.scope_manager, owner, "Expression", sl, el)
        st.add_expression(inv)
        st.text = inv.text + ";"
        return st

    def _st_SuperConstructorInvocation(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:1083-1130."""
        sl, el = self._sl(j), self.lines.line_of(j.get("stmt_end", j.end))
        inv = ExpressionInfo(self.idgen, "SuperConstructorInvocation", sl, el)
        text = ["super("]
        for a in j["args"]:
            ae = self.build_expression(a)
            if ae is not None:
                inv.add_expression(ae)
                text.append(ae.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append(")")
        inv.text = "".join(text)
        st = StatementInfo(self.idgen, self.scope_manager, owner, "Expression", sl, el)
        st.add_expression(inv)
        st.text = inv.text + ";"
        return st

    def _st_Return(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Return")
        text = ["return"]
        if j["expr"] is not None:
            expr = self.build_expression(j["expr"])
            if expr is not None:
                st.add_expression(expr)
                text.append(" ")
                text.append(expr.text)
        text.append(";")
        st.text = "".join(text)
        return st

    def _st_Throw(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Throw")
        expr = self.build_expression(j["expr"])
        text = ["throw "]
        if expr is not None:
            st.add_expression(expr)
            text.append(expr.text)
        text.append(";")
        st.text = "".join(text)
        return st

    def _st_Assert(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:356-378 — children BEFORE stmt; text unset."""
        expr = self.build_expression(j["expr"])
        msg = self.build_expression(j["message"]) if j["message"] is not None else None
        st = self._new_stmt(j, owner, "Assert")
        if expr is not None:
            st.add_expression(expr)
        if msg is not None:
            st.add_expression(msg)
        return st

    def _st_Break(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Break")
        text = ["break"]
        if j["label"] is not None:
            label = self.build_expression(j["label"])
            if label is not None:
                st.add_expression(label)
                text.append(" ")
                text.append(label.text)
        text.append(";")
        st.text = "".join(text)
        return st

    def _st_Continue(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Continue")
        text = ["continue"]
        if j["label"] is not None:
            label = self.build_expression(j["label"])
            if label is not None:
                st.add_expression(label)
                text.append(" ")
                text.append(label.text)
        text.append(";")
        st.text = "".join(text)
        return st

    def _st_Labeled(self, j: J, owner: PE) -> Optional[StatementInfo]:
        """PEASTVisitor.java:1686-1694: label attaches to the body's PE."""
        st = self.build_statement(j["body"], owner)
        if st is not None:
            st.label = j["label"]
        return st

    def _st_VarDeclStmt(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:1172-1211."""
        st = self._new_stmt(j, owner, "VariableDeclaration")
        for frag in j["fragments"]:
            if frag.t == "VarDeclFragment":
                self._declare_type(frag["name"]["name"], j["type"]["text"])
        text: List[str] = []
        for mod in j["modifiers"]:
            text.append(mod)
            text.append(" ")
        sl, el = self._sl(j), self._el(j)
        type_info = TypeInfo(self.idgen, j["type"]["text"], sl, el)
        st.add_expression(type_info)
        text.append(j["type"]["text"])
        text.append(" ")
        for frag in j["fragments"]:
            fe = self.build_expression(frag)
            if fe is not None:
                st.add_expression(fe)
                text.append(fe.text)
                text.append(",")
        if text and text[-1] == ",":
            text.pop()
        text.append(";")
        st.text = "".join(text)
        return st

    def _st_If(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "If")
        text = ["if ("]
        cond = self.build_expression(j["cond"])
        if cond is not None:
            st.condition = cond
            cond.owner_conditional_block = st
            text.append(cond.text)
            cond.text = "if " + cond.text  # PEASTVisitor.java:1401
        text.append(") ")
        if j["then"] is not None:
            then_body = self.build_statement(j["then"], st)
            if then_body is not None:
                st.set_statement(then_body)
                text.append(then_body.text)
        if j["else_stmt"] is not None:
            else_body = self.build_statement(j["else_stmt"], st)
            if else_body is not None:
                st.set_else_statement(else_body)
                text.append(else_body.text)
        st.text = "".join(text)
        return st

    def _st_While(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "While")
        cond = self.build_expression(j["cond"])
        text = ["while ("]
        if cond is not None:
            st.condition = cond
            cond.owner_conditional_block = st
            text.append(cond.text)
            cond.text = "while " + cond.text  # PEASTVisitor.java:1580
        text.append(") ")
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
        st.text = "".join(text)
        return st

    def _st_Do(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Do")
        text: List[str] = []
        body = self.build_statement(j["body"], st)
        text.append("do ")
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
        cond = self.build_expression(j["cond"])
        if cond is not None:
            st.condition = cond
            cond.owner_conditional_block = st
            text.extend(("while (", cond.text, ");"))
        st.text = "".join(text)
        return st

    def _st_For(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "For")
        self._push_env()  # for-init declarations scope to the loop
        text = ["for ("]
        for init_j in j["inits"]:
            init = self.build_expression(init_j)
            if init is not None and isinstance(init, ExpressionInfo):
                st.add_initializer(init)
                text.append(init.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append("; ")
        if j["cond"] is not None:
            cond = self.build_expression(j["cond"])
            if cond is not None:
                st.condition = cond
                cond.owner_conditional_block = st
                text.append(cond.text)
        text.append("; ")
        for upd_j in j["updaters"]:
            upd = self.build_expression(upd_j)
            if upd is not None and isinstance(upd, ExpressionInfo):
                st.add_updater(upd)
                text.append(upd.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append(")")
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
            st.text = "".join(text)  # text only set when body built
        self._pop_env()
        return st

    def _st_EnhancedFor(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:1278-1317 — param+expr BEFORE the foreach stmt;
        condition stays None (the CFG substitutes a pseudo node)."""
        self._push_env()  # the foreach variable scopes to the loop
        text = ["for ("]
        param = self.build_single_variable_declaration(j["param"])
        if param is not None:
            text.append(param.text)
            text.append(" : ")
        expr = self.build_expression(j["expr"])
        if expr is not None:
            text.append(expr.text)
            text.append(")")
        st = self._new_stmt(j, owner, "Foreach")
        if param is not None:
            st.add_initializer(param)
        if expr is not None:
            st.add_initializer(expr)
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
        st.text = "".join(text)
        self._pop_env()
        return st

    def _st_Switch(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Switch")
        text = ["switch ("]
        cond = self.build_expression(j["expr"])
        if cond is not None:
            st.condition = cond
            cond.owner_conditional_block = st
            text.append(cond.text)
        text.append(") {")
        text.append(NL)
        # Java scoping: a local declared inside a switch case is visible
        # only until the switch ends — scope the env like Block/For/Catch
        # so declared-type receiver resolution can't see it afterwards.
        self._push_env()
        for s in j["statements"]:
            sub = self.build_statement(s, st)
            if sub is not None:
                st.add_statement(sub)
                text.append(sub.text)
                text.append(NL)
        self._pop_env()
        st.text = "".join(text)
        return st

    def _st_SwitchCase(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Case")
        text: List[str] = []
        for e in j["exprs"]:
            if e is None:
                continue  # 'default': JDT expressions() empty -> text ':'
            expr = self.build_expression(e)
            if expr is not None:
                st.add_expression(expr)
                text.append("case ")
                text.append(expr.text)
        text.append(":")
        st.text = "".join(text)
        return st

    def _st_Synchronized(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Synchronized")
        text = ["synchronized ("]
        cond = self.build_expression(j["expr"])
        if cond is not None:
            st.condition = cond
            cond.owner_conditional_block = st
            text.append(cond.text)
        text.append(") ")
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
        st.text = "".join(text)
        return st

    def _st_Try(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "Try")
        text = ["try "]
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
            text.append(body.text)
        for c in j["catches"]:
            catch_st = self._st_Catch(c, st)
            if catch_st is not None:
                st.add_catch_statement(catch_st)
                text.append(catch_st.text)
        if j["finally_block"] is not None:
            fin = self.build_statement(j["finally_block"], st)
            if fin is not None:
                st.finally_statement = fin
                text.append(fin.text)
        st.text = "".join(text)
        return st

    def _st_Catch(self, j: J, owner: PE) -> StatementInfo:
        """PEASTVisitor.java:1726-1757 (text quirk: body text is NOT
        appended; catchBlock.getText() was still empty at append time)."""
        st = self._new_stmt(j, owner, "Catch")
        self._push_env()  # the catch parameter scopes to the handler
        text = ["catch ("]
        exc = self.build_single_variable_declaration(j["exc"])
        if exc is not None:
            exc.owner_conditional_block = st
            st.condition = exc
            text.append(exc.text)
        text.append(") ")
        body = self.build_statement(j["body"], st)
        if body is not None:
            st.set_statement(body)
        st.text = "".join(text)
        self._pop_env()
        return st

    def _st_TypeDeclarationStatement(self, j: J, owner: PE) -> StatementInfo:
        st = self._new_stmt(j, owner, "TypeDeclaration")
        decl = self.build_type_declaration(j["decl"])
        if decl is not None:
            st.add_expression(decl)
            st.text = decl.text
        return st

    # ---------------------------------------------------------- expressions

    def build_expression(self, j: J) -> Optional[PE]:
        handler = getattr(self, "_ex_" + j.t, None)
        if handler is None:
            return None
        return handler(j)

    def _new_expr(self, j: J, category: str) -> ExpressionInfo:
        return ExpressionInfo(self.idgen, category, self._sl(j), self._el(j))

    def _ex_SimpleName(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "SimpleName")
        e.text = j["name"]
        return e

    def _ex_QualifiedName(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "QualifiedName")
        text: List[str] = []
        qual = self.build_expression(j["qualifier"])
        if qual is not None:
            e.qualifier = qual
            text.append(qual.text)
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(".")
            text.append(name.text)
        e.text = "".join(text)
        return e

    def _ex_FieldAccess(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "FieldAccess")
        text: List[str] = []
        base = self.build_expression(j["expr"])
        if base is not None:
            e.add_expression(base)
            text.append(base.text)
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(".")
            text.append(name.text)
        e.text = "".join(text)
        return e

    def _ex_This(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "This")
        e.text = "this"
        return e

    def _ex_NumberLiteral(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Number")
        e.text = j["token"]
        return e

    def _ex_StringLiteral(self, j: J) -> Optional[ExpressionInfo]:
        raw = j["raw"]
        if raw.startswith('"""'):
            return None  # TextBlock: separate JDT node, not visited -> drop
        e = self._new_expr(j, "String")
        e.text = '"' + unescape_java(raw[1:-1]) + '"'
        return e

    def _ex_CharLiteral(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Character")
        e.text = "'" + unescape_java(j["raw"][1:-1]) + "'"
        return e

    def _ex_BooleanLiteral(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Boolean")
        e.text = j["value"]
        return e

    def _ex_NullLiteral(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Null")
        e.text = "null"
        return e

    def _ex_TypeLiteral(self, j: J) -> ExpressionInfo:
        return self._new_expr(j, "TypeLiteral")  # text stays "" (quirk)

    def _ex_Infix(self, j: J) -> ExpressionInfo:
        """PEASTVisitor.java:635-685 (note the ' ( l op r )' rendering and
        extended operands appended AFTER the closing paren)."""
        e = self._new_expr(j, "Infix")
        text = [" ( "]
        left = self.build_expression(j["left"])
        if left is not None:
            e.add_expression(left)
            text.append(left.text)
            text.append(" ")
        op = OperatorInfo(self.idgen, j["op"], self._sl(j), self._el(j))
        e.add_expression(op)
        text.append(op.text)
        text.append(" ")
        right = self.build_expression(j["right"])
        if right is not None:
            e.add_expression(right)
            text.append(right.text)
            text.append(" )")
        for ext_j in j["extended"]:
            ext = self.build_expression(ext_j)
            if ext is not None:
                e.add_expression(op)
                e.add_expression(ext)
                text.extend((" ", op.text, " ", ext.text))
        e.text = "".join(text)
        return e

    def _ex_Prefix(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Prefix")
        text: List[str] = []
        op = OperatorInfo(self.idgen, j["op"], self._sl(j), self._el(j))
        e.add_expression(op)
        text.append(op.text)
        operand = self.build_expression(j["operand"])
        if operand is not None:
            e.add_expression(operand)
            text.append(operand.text)
        e.text = "".join(text)
        return e

    def _ex_Postfix(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Postfix")
        text: List[str] = []
        operand = self.build_expression(j["operand"])
        if operand is not None:
            e.add_expression(operand)
            text.append(operand.text)
        op = OperatorInfo(self.idgen, j["op"], self._sl(j), self._el(j))
        e.add_expression(op)
        text.append(op.text)
        e.text = "".join(text)
        return e

    def _ex_Parenthesized(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Parenthesized")
        inner = self.build_expression(j["expr"])
        if inner is not None:
            e.add_expression(inner)
            e.text = "(" + inner.text + ")"
        return e

    def _ex_Assignment(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Assignment")
        text: List[str] = []
        left = self.build_expression(j["left"])
        if left is not None:
            e.add_expression(left)
            text.append(left.text)
        op = OperatorInfo(self.idgen, j["op"], self._sl(j), self._el(j))
        e.add_expression(op)
        text.extend((" ", op.text, " "))
        right = self.build_expression(j["right"])
        if right is not None:
            e.add_expression(right)
            text.append(right.text)
        e.text = "".join(text)
        return e

    def _ex_Cast(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Cast")
        sl, el = self._sl(j), self._el(j)
        type_info = TypeInfo(self.idgen, j["type"]["text"], sl, el)
        e.add_expression(type_info)
        text = ["(", type_info.text, ")"]
        operand = self.build_expression(j["operand"])
        if operand is not None:
            e.add_expression(operand)
            text.append(operand.text)
        e.text = "".join(text)
        return e

    def _ex_InstanceOf(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Instanceof")
        text: List[str] = []
        left = self.build_expression(j["left"])
        if left is not None:
            e.add_expression(left)
            text.append(left.text)
        if j["rhs"] is not None:
            right = self.build_expression(j["rhs"])
            if right is not None:
                e.add_expression(right)
                text.append(" instanceof ")
                text.append(right.text)
        e.text = "".join(text)
        return e

    def _ex_Conditional(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "Trinomial")
        text: List[str] = []
        cond = self.build_expression(j["cond"])
        if cond is not None:
            e.add_expression(cond)
            text.extend((cond.text, " ? "))
        then = self.build_expression(j["then"])
        if then is not None:
            e.add_expression(then)
            text.extend((then.text, " : "))
        else_e = self.build_expression(j["else_e"])
        if else_e is not None:
            e.add_expression(else_e)
            text.append(else_e.text)
        e.text = "".join(text)
        return e

    def _ex_MethodInvocation(self, j: J) -> ExpressionInfo:
        """PEASTVisitor.java:980-1029; apiName uses the binding-less fallback
        (receiver text) since no JDT bindings exist here (line 1023)."""
        e = self._new_expr(j, "MethodInvocation")
        text: List[str] = []
        receiver_text = None
        if j["expr"] is not None:
            base = self.build_expression(j["expr"])
            if base is not None:
                e.qualifier = base
                receiver_text = base.text
                text.append(base.text)
                text.append(".")
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(name.text)
            text.append("(")
        for a in j["args"]:
            ae = self.build_expression(a)
            if ae is not None:
                e.add_expression(ae)
                text.append(ae.text)
                text.append(",")
        if text and text[-1] == ",":
            text.pop()
        text.append(")")
        e.text = "".join(text)
        if j["expr"] is not None and receiver_text is not None:
            # apiName = qualifiedReceiverType.method() like JDT bindings
            # (pe/ExpressionInfo.java:66-70, PEASTVisitor.java:1017-1025):
            # a declared receiver (field/param/local — Java obscuring puts
            # variables before types) resolves through its DECLARED type
            # from the scope stack, then the import table qualifies the
            # type; an undeclared identifier is treated as a static type
            # receiver directly.
            recv = receiver_text
            resolved = None
            this_field = False
            if recv.startswith("this."):
                # 'this.x' explicitly names the innermost class's FIELD —
                # a shadowing local/param must NOT win (JDT field binding).
                # Unresolvable field receivers (inherited fields, chains)
                # still NORMALIZE away the 'this.' prefix so candidate
                # strings keep the historical 'x.m()' form — but they are
                # FIELD accesses, so they must never fall through to the
                # import table as if they were static type receivers.
                fld = recv[5:]
                recv = fld
                this_field = True
                if _IDENT_RE.match(fld) and self.class_envs:
                    resolved = self.class_envs[-1].get(fld)
            elif _IDENT_RE.match(recv):
                resolved = self._lookup_type(recv)
            if resolved is None and j["expr"].t == "MethodInvocation" \
                    and self.method_return_envs:
                # same-class chained call: make().m() / this.make().m()
                # resolves through make()'s declared return type
                inner = j["expr"]
                inner_recv = inner.get("expr")
                if inner_recv is None or inner_recv.t == "This":
                    resolved = self.method_return_envs[-1].get(
                        inner["name"]["name"])
            if resolved is not None:
                recv = resolved
            if this_field and resolved is None:
                fqn = recv  # unresolved field access: no import lookup
            else:
                fqn = self._qualify_type(recv)
            e.api_name = fqn + "." + j["name"]["name"] + "()"
        return e

    def _qualify_type(self, recv: str) -> str:
        """Static stand-in for JDT type-binding qualification: single-type
        imports first; then a type declared in THIS compilation unit gets
        the unit's package (JLS §7.4.2 — same-package types resolve
        without an import); then unimported hot JRE names qualify as
        java.lang.* (JLS §7.3 — java.lang is implicitly imported, and
        JDT bindings always report the qualified name). Everything else
        keeps the simple name (no classpath exists to resolve it)."""
        fqn = self.imports.get(recv)
        if fqn is not None:
            return fqn
        if recv in self.unit_types:
            return f"{self.package}.{recv}" if self.package else recv
        if recv in _JAVA_LANG:
            return "java.lang." + recv
        return recv

    def _ex_SuperMethodInvocation(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "SuperMethodInvocation")
        text = ["super."]
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(name.text)
        for a in j["args"]:  # quirk: args appended with no parens/commas
            ae = self.build_expression(a)
            if ae is not None:
                e.add_expression(ae)
                text.append(ae.text)
        e.text = "".join(text)
        return e

    def _ex_SuperFieldAccess(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "SuperFieldAccess")
        text = ["super."]
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(name.text)
        e.text = "".join(text)
        return e

    def _ex_ClassInstanceCreation(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "ClassInstanceCreation")
        sl, el = self._sl(j), self._el(j)
        type_info = TypeInfo(self.idgen, j["type"]["text"], sl, el)
        e.add_expression(type_info)
        text = ["new ", type_info.text, "("]
        for a in j["args"]:
            ae = self.build_expression(a)
            if ae is not None:
                e.add_expression(ae)
                text.append(ae.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append(")")
        if j["anon"] is not None:
            anon = self.build_anonymous_class(j["anon"])
            if anon is not None:
                e.anonymous_class_declaration = anon
                text.append(anon.text)
        e.text = "".join(text)
        return e

    def build_anonymous_class(self, j: J) -> ClassInfo:
        """PEASTVisitor.java:236-257 (methods NOT added to self.methods)."""
        cls = ClassInfo(self.idgen, None, self._sl(j), self._el(j))
        # anonymous classes get their own field scope: 'this' inside one
        # is the anonymous instance, so this.x binds to ITS fields
        # (no mention seeds: anonymous classes have no stable class name)
        self._enter_class_scope(j["body"], seed_node_id=None)
        text = ["{", NL]
        for member in j["body"]:
            if member.t == "MethodDeclaration":
                m = self.build_method_declaration(member)
                if m is not None:
                    cls.methods.append(m)
                    text.append(m.text)
        text.append("}")
        cls.text = "".join(text)
        self._exit_class_scope()
        return cls

    def _ex_ArrayAccess(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "ArrayAccess")
        text: List[str] = []
        arr = self.build_expression(j["array"])
        if arr is not None:
            e.add_expression(arr)
            text.append(arr.text)
        idx = self.build_expression(j["index"])
        if idx is not None:
            e.add_expression(idx)
            text.extend(("[", idx.text, "]"))
        e.text = "".join(text)
        return e

    def _ex_ArrayCreation(self, j: J) -> ExpressionInfo:
        """PEASTVisitor.java:687-714 (quirks: text is 'new <ArrayType>[]';
        dimension exprs are never rendered; appending the initializer appends
        the still-empty self text, i.e. nothing)."""
        e = self._new_expr(j, "ArrayCreation")
        sl, el = self._sl(j), self._el(j)
        type_text = j["element_type"] + "[]" * j["dims"]
        type_info = TypeInfo(self.idgen, type_text, sl, el)
        e.add_expression(type_info)
        text = ["new ", type_info.text, "[]"]
        if j["initializer"] is not None:
            init = self.build_expression(j["initializer"])
            if init is not None:
                e.add_expression(init)
                # text.append(arrayCreation) in the reference appends
                # this.getText() which is still "" here -> no-op.
        e.text = "".join(text)
        return e

    def _ex_ArrayInitializer(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "ArrayInitializer")
        text = ["{"]
        for x in j["exprs"]:
            xe = self.build_expression(x)
            if xe is not None:
                e.add_expression(xe)
                text.append(xe.text)
                text.append(",")
        if text[-1] == ",":
            text.pop()
        text.append("}")
        e.text = "".join(text)
        return e

    def _ex_VarDeclExpr(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "VariableDeclarationExpression")
        for frag in j["fragments"]:
            if frag.t == "VarDeclFragment":
                self._declare_type(frag["name"]["name"], j["type"]["text"])
        sl, el = self._sl(j), self._el(j)
        type_info = TypeInfo(self.idgen, j["type"]["text"], sl, el)
        e.add_expression(type_info)
        text = [type_info.text, " "]
        for frag in j["fragments"]:
            fe = self.build_expression(frag)
            if fe is not None:
                e.add_expression(fe)
                text.append(fe.text)  # no comma (PEASTVisitor.java:1160-1166)
        e.text = "".join(text)
        return e

    def _ex_VarDeclFragment(self, j: J) -> ExpressionInfo:
        e = self._new_expr(j, "VariableDeclarationFragment")
        text: List[str] = []
        name = self.build_expression(j["name"])
        if name is not None:
            e.add_expression(name)
            text.append(name.text)
        if j["init"] is not None:
            init = self.build_expression(j["init"])
            if init is not None:
                e.add_expression(init)
                text.append(" = ")
                text.append(init.text)
        e.text = "".join(text)
        return e

    def _ex_Lambda(self, j: J) -> MethodInfo:
        """PEASTVisitor.java:304-354 — lambdas build a MethodInfo that is
        used as an expression child; CFG skips lambda bodies."""
        method = MethodInfo(self.idgen, self.scope_manager, True, None,
                            self._sl(j), self._el(j))
        text: List[str] = []
        if j["parens"]:
            text.append("(")
        for p in j["params"]:
            vdf = self.build_expression(p)
            if vdf is not None and vdf.expressions:
                text.append(vdf.expressions[0].text)
                text.append(",")
        if text and text[-1] == ",":
            text.pop()
        if j["parens"]:
            text.append(")")
        text.append(" -> ")
        body_j = j["body"]
        if body_j is not None:
            if body_j.t == "Block":
                body = self.build_statement(body_j, method)
                if body is not None:
                    method.set_statement(body)
                    text.append(body.text)
            else:
                body_e = self.build_expression(body_j)
                if body_e is not None and isinstance(body_e, ExpressionInfo):
                    method.lambda_expression = body_e
                    text.append(body_e.text)
        else:
            text.append("{}")
        method.text = "".join(text)
        return method

    def _ex_Unknown(self, j: J) -> None:
        return None


def build_methods(source: str) -> List[MethodInfo]:
    """Parse one compilation unit and return its top-level methods
    (equivalent of PEASTVisitor.getMethods() after unit.accept)."""
    return PEBuilder(source).build()
