"""Recursive-descent Java parser producing a lightweight syntax tree (JAST).

The JAST mirrors the JDT node inventory that the reference visitor handles
(/root/reference .../ast/PEASTVisitor.java:177-1806); a separate builder
(pebuilder.py) converts JAST -> PE tree in the reference's creation order.

Design goals:
- cover every construct in StatementInfo.CATEGORY / ExpressionInfo.CATEGORY
  (pe/StatementInfo.java:166-187, pe/ExpressionInfo.java:83-114);
- degrade gracefully: unsupported constructs become ``Unknown`` nodes which
  the builder drops, mirroring PESafeStack's drop-subtree behavior
  (ast/PESafeStack.java:35-60);
- keep exact source offsets so line numbers match JDT's
  (ast/PEASTVisitor.java:117-153).
"""

from __future__ import annotations

from typing import List, Optional

from .lexer import Token, tokenize

ASSIGN_OPS = frozenset(["=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
                        "<<=", ">>=", ">>>="])
MODIFIER_KEYWORDS = frozenset(
    """public private protected static final abstract synchronized native
    transient volatile strictfp default sealed non-sealed""".split())
PRIMITIVES = frozenset("boolean byte char short int long float double void".split())

# binary precedence levels, weakest first (after assignment/ternary)
_BINARY_LEVELS = [
    ("||",), ("&&",), ("|",), ("^",), ("&",),
    ("==", "!="),
    ("<", ">", "<=", ">=", "instanceof"),
    ("<<", ">>", ">>>"),
    ("+", "-"),
    ("*", "/", "%"),
]
_BINARY_PREC = {op: lvl for lvl, ops in enumerate(_BINARY_LEVELS)
                for op in ops}


class ParseError(ValueError):
    pass


class J:
    """JAST node: type tag + field dict + source offsets [start, end)."""

    __slots__ = ("t", "start", "end", "f")

    def __init__(self, t: str, start: int, end: int, **fields):
        self.t = t
        self.start = start
        self.end = end
        self.f = fields

    def __getitem__(self, k):
        return self.f[k]

    def get(self, k, default=None):
        return self.f.get(k, default)

    def __repr__(self):
        return f"J({self.t}, {self.start}:{self.end})"


class Parser:
    def __init__(self, source: str):
        self.src = source
        self.toks: List[Token] = tokenize(source)
        self.pos = 0

    # ------------------------------------------------------------ helpers

    def peek(self, ahead: int = 0) -> Token:
        i = self.pos + ahead
        toks = self.toks
        return toks[i] if i < len(toks) else toks[-1]

    def at(self, value: str, ahead: int = 0) -> bool:
        i = self.pos + ahead
        toks = self.toks
        return (toks[i] if i < len(toks) else toks[-1]).value == value

    def at_kind(self, kind: str, ahead: int = 0) -> bool:
        i = self.pos + ahead
        toks = self.toks
        return (toks[i] if i < len(toks) else toks[-1]).kind == kind

    def advance(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, value: str) -> Token:
        t = self.peek()
        if t.value != value:
            raise ParseError(f"expected {value!r}, got {t.value!r} at offset {t.start}")
        return self.advance()

    def accept(self, value: str) -> Optional[Token]:
        if self.at(value):
            return self.advance()
        return None

    def split_gt(self) -> None:
        """Consume one '>' from a '>>'/'>>>'/'>='... token (generics)."""
        t = self.peek()
        if t.value == ">":
            self.advance()
            return
        if t.value.startswith(">") and len(t.value) > 1:
            self.toks[self.pos] = Token("op", t.value[1:], t.start + 1, t.end)
            return
        raise ParseError(f"expected '>' at offset {t.start}, got {t.value!r}")

    def skip_balanced(self, open_v: str, close_v: str) -> int:
        """Skip a balanced bracket region; returns end offset."""
        self.expect(open_v)
        depth = 1
        while depth:
            t = self.advance()
            if t.kind == "eof":
                raise ParseError("unbalanced brackets")
            if t.value == open_v:
                depth += 1
            elif t.value == close_v:
                depth -= 1
        return self.toks[self.pos - 1].end

    # --------------------------------------------------- compilation unit

    def parse_compilation_unit(self) -> J:
        types: List[J] = []
        imports: List[str] = []
        package = ""
        while not self.at_kind("eof"):
            if self.at("package"):
                self.advance()
                parts: List[str] = []
                while not self.at(";") and not self.at_kind("eof"):
                    t = self.advance()
                    if t.kind in ("ident", "keyword"):
                        parts.append(t.value)
                package = ".".join(parts)
                self.accept(";")
                continue
            if self.at("import"):
                self.advance()
                self.accept("static")
                parts: List[str] = []
                while not self.at(";") and not self.at_kind("eof"):
                    t = self.advance()
                    if t.kind in ("ident", "keyword") or t.value in (".", "*"):
                        parts.append(t.value)
                self.accept(";")
                path = "".join(parts)
                if path and not path.endswith("*"):
                    imports.append(path)
                continue
            if self.at(";"):
                self.advance()
                continue
            start = self.peek().start
            mods = self.parse_modifiers()
            kw = self.peek().value
            if kw == "class" or kw == "interface":
                types.append(self.parse_type_declaration(start, mods))
            elif kw in ("enum", "record"):
                # EnumDeclaration / RecordDeclaration are not TypeDeclarations
                # -> never visited by the reference (PEASTVisitor has no
                # visit(EnumDeclaration)); skip their bodies.
                self.skip_to_body_and_discard()
            elif kw == "@" or self.at("@"):
                self.parse_modifiers()
            else:
                # stray token; skip to avoid infinite loop
                self.advance()
        return J("CompilationUnit", 0, len(self.src), types=types,
                 imports=imports, package=package)

    def skip_to_body_and_discard(self) -> None:
        while not self.at("{") and not self.at_kind("eof"):
            self.advance()
        if self.at("{"):
            self.skip_balanced("{", "}")

    def parse_modifiers(self) -> List[str]:
        """Modifiers + annotations as flattened text (JDT Modifier/Annotation
        toString, used verbatim in method text, PEASTVisitor.java:269-271)."""
        mods: List[str] = []
        while True:
            t = self.peek()
            if t.value in MODIFIER_KEYWORDS:
                mods.append(t.value)
                self.advance()
            elif t.value == "@" and not self.at("interface", 1):
                self.advance()
                name_parts = [self.advance().value]
                while self.at("."):
                    self.advance()
                    name_parts.append(self.advance().value)
                text = "@" + ".".join(name_parts)
                if self.at("("):
                    a_start = self.peek().start
                    a_end = self.skip_balanced("(", ")")
                    text += self.src[a_start:a_end]
                mods.append(text)
            else:
                return mods

    # ------------------------------------------------------------- types

    def try_parse_type(self) -> Optional[J]:
        save = self.pos
        save_tok = self.toks[self.pos]
        try:
            return self.parse_type()
        except ParseError:
            self.pos = save
            self.toks[self.pos] = save_tok
            return None

    def parse_type(self) -> J:
        """Parse a type; node text follows NaiveASTFlattener rendering:
        qualified names '.', type args '<A,B>' (no spaces), arrays 'T[]'."""
        start = self.peek().start
        t = self.peek()
        if t.value in PRIMITIVES or t.value == "var":
            self.advance()
            text = t.value
        elif t.kind == "ident":
            parts = []
            while True:
                seg = self.advance()
                if seg.kind != "ident":
                    raise ParseError(f"bad type segment {seg.value!r} at {seg.start}")
                seg_text = seg.value
                if self.at("<"):
                    seg_text += self.parse_type_arguments()
                parts.append(seg_text)
                if self.at(".") and self.at_kind("ident", 1):
                    self.advance()
                    continue
                break
            text = ".".join(parts)
        elif t.value == "?":
            self.advance()
            text = "?"
            if self.at("extends") or self.at("super"):
                kw = self.advance().value
                bound = self.parse_type()
                text = f"? {kw} {bound['text']}"
        else:
            raise ParseError(f"not a type at offset {t.start}: {t.value!r}")
        # array dims
        while self.at("[") and self.at("]", 1):
            self.advance()
            self.advance()
            text += "[]"
        # varargs handled by caller
        end = self.toks[self.pos - 1].end
        return J("Type", start, end, text=text)

    def parse_type_arguments(self) -> str:
        """'<' already peeked; returns rendered '<A,B>' (or '<>' diamond)."""
        self.expect("<")
        if self.at(">") or self.peek().value.startswith(">"):
            self.split_gt()
            return "<>"
        args = []
        while True:
            args.append(self.parse_type()["text"])
            if self.accept(","):
                continue
            self.split_gt()
            break
        return "<" + ",".join(args) + ">"

    # -------------------------------------------------- type declarations

    def parse_type_declaration(self, start: int, mods: List[str]) -> J:
        kw = self.advance().value  # class | interface
        name = self.advance().value
        if self.at("<"):
            self.parse_type_arguments()  # type parameters, rendered away
        superclass = None
        while not self.at("{") and not self.at_kind("eof"):
            tok = self.advance()  # extends/implements/permits clauses
            if tok.value == "extends" and kw == "class" and superclass is None:
                # capture the single superclass name (same-unit extends
                # chains feed inherited-receiver apiName resolution); the
                # interface extends-list stays skipped
                typ = self.try_parse_type()
                if typ is not None:
                    superclass = typ["text"]
        body: List[J] = []
        self.expect("{")
        while not self.at("}") and not self.at_kind("eof"):
            member = self.parse_class_member(name)
            if member is not None:
                body.append(member)
        end_tok = self.expect("}")
        return J("TypeDeclaration", start, end_tok.end, name=name, kind=kw,
                 modifiers=mods, body=body, superclass=superclass)

    def parse_class_member(self, class_name: str) -> Optional[J]:
        """Returns MethodDeclaration or nested TypeDeclaration (both kept in
        bodyDeclarations; only MethodDeclarations are processed by the
        reference, PEASTVisitor.java:190-199); fields/initializers -> None."""
        if self.accept(";"):
            return None
        start = self.peek().start
        mods = self.parse_modifiers()
        t = self.peek()
        if t.value == "{":  # instance/static initializer -> not visited
            self.skip_balanced("{", "}")
            return None
        if t.value in ("class", "interface"):
            return self.parse_type_declaration(start, mods)
        if t.value in ("enum", "record"):
            self.skip_to_body_and_discard()
            return None
        type_params = None
        if t.value == "<":
            type_params = self.parse_type_arguments()
        # constructor: Name '('
        if self.at_kind("ident") and self.at("(", 1) and self.peek().value == class_name:
            name_tok = self.advance()
            return self.finish_method(start, mods, None, name_tok.value, True)
        # method or field: Type Name ...
        typ = self.try_parse_type()
        if typ is None:
            # unparseable member; skip one token to make progress
            self.advance()
            return None
        if not self.at_kind("ident"):
            # e.g. compact record ctor or junk; skip statementish
            while not self.at(";") and not self.at("{") and not self.at_kind("eof"):
                self.advance()
            if self.at("{"):
                self.skip_balanced("{", "}")
            else:
                self.accept(";")
            return None
        name_tok = self.advance()
        if self.at("("):
            return self.finish_method(start, mods, typ, name_tok.value, False)
        # field declaration -> the PE tree drops it (not visited by the
        # reference, PEASTVisitor.java:190-199), but the declared TYPES
        # feed the builder's receiver-type table for apiName resolution
        self.pos -= 1  # back to name
        names = self.parse_variable_fragments_discard()
        end_tok = self.accept(";")
        return J("FieldDeclaration", start,
                 end_tok.end if end_tok else self.peek().start,
                 type=typ, names=names, modifiers=mods)

    def parse_variable_fragments_discard(self) -> List[str]:
        names: List[str] = []
        while True:
            names.append(self.advance().value)  # name
            while self.at("[") and self.at("]", 1):
                self.advance()
                self.advance()
            if self.accept("="):
                if self.at("{"):
                    self.parse_array_initializer()
                else:
                    self.parse_expression()
            if self.accept(","):
                continue
            break
        return names

    def finish_method(self, start: int, mods: List[str], return_type: Optional[J],
                      name: str, is_ctor: bool) -> J:
        params = self.parse_parameters()
        while self.at("[") and self.at("]", 1):  # C-style return dims
            self.advance()
            self.advance()
        if self.at("throws"):
            self.advance()
            self.parse_type()
            while self.accept(","):
                self.parse_type()
        body = None
        if self.at("{"):
            body = self.parse_block()
        else:
            self.accept(";")
        end = self.toks[self.pos - 1].end
        return J("MethodDeclaration", start, end, name=name, modifiers=mods,
                 return_type=return_type, params=params, body=body,
                 is_ctor=is_ctor)

    def parse_parameters(self) -> List[J]:
        self.expect("(")
        params: List[J] = []
        while not self.at(")"):
            start = self.peek().start
            mods = self.parse_modifiers()
            typ = self.parse_type()
            if self.at("..."):
                self.advance()
            if self.at("this"):  # receiver parameter -> discard
                self.advance()
            else:
                name_tok = self.advance()
                while self.at("[") and self.at("]", 1):
                    self.advance()
                    self.advance()
                end = self.toks[self.pos - 1].end
                params.append(J("SingleVarDecl", start, end, modifiers=mods,
                                type=typ, name=name_tok.value))
            if not self.accept(","):
                break
        self.expect(")")
        return params

    # --------------------------------------------------------- statements

    def parse_block(self) -> J:
        start = self.expect("{").start
        stmts: List[J] = []
        while not self.at("}") and not self.at_kind("eof"):
            stmts.append(self.parse_statement())
        end = self.expect("}").end
        return J("Block", start, end, statements=stmts)

    def parse_statement(self) -> J:
        t = self.peek()
        v = t.value
        if v == "{":
            return self.parse_block()
        if v == ";":
            tok = self.advance()
            return J("Empty", tok.start, tok.end)
        if v == "if":
            return self.parse_if()
        if v == "while":
            return self.parse_while()
        if v == "do":
            return self.parse_do()
        if v == "for":
            return self.parse_for()
        if v == "switch":
            return self.parse_switch()
        if v == "try":
            return self.parse_try()
        if v == "synchronized":
            start = self.advance().start
            self.expect("(")
            expr = self.parse_expression()
            self.expect(")")
            body = self.parse_block()
            return J("Synchronized", start, body.end, expr=expr, body=body)
        if v == "return":
            start = self.advance().start
            expr = None if self.at(";") else self.parse_expression()
            end = self.expect(";").end
            return J("Return", start, end, expr=expr)
        if v == "throw":
            start = self.advance().start
            expr = self.parse_expression()
            end = self.expect(";").end
            return J("Throw", start, end, expr=expr)
        if v == "break" or v == "continue":
            start = self.advance().start
            label = None
            if self.at_kind("ident"):
                lt = self.advance()
                label = J("SimpleName", lt.start, lt.end, name=lt.value)
            end = self.expect(";").end
            return J("Break" if v == "break" else "Continue", start, end, label=label)
        if v == "assert":
            start = self.advance().start
            expr = self.parse_expression()
            msg = None
            if self.accept(":"):
                msg = self.parse_expression()
            end = self.expect(";").end
            return J("Assert", start, end, expr=expr, message=msg)
        if v in ("class", "interface") or (
                v in MODIFIER_KEYWORDS and self._looks_like_local_class()):
            start = t.start
            mods = self.parse_modifiers()
            decl = self.parse_type_declaration(start, mods)
            return J("TypeDeclarationStatement", start, decl.end, decl=decl)
        if v == "yield":
            start = self.advance().start
            self.parse_expression()
            end = self.expect(";").end
            return J("Unknown", start, end)
        # labeled statement: ident ':'
        if t.kind == "ident" and self.at(":", 1):
            label_tok = self.advance()
            self.advance()  # ':'
            body = self.parse_statement()
            return J("Labeled", label_tok.start, body.end,
                     label=label_tok.value, body=body)
        # local variable declaration?
        decl = self.try_parse_local_var_decl()
        if decl is not None:
            return decl
        # expression statement
        start = t.start
        expr = self.parse_expression()
        end = self.expect(";").end
        if expr.t == "ConstructorInvocation" or expr.t == "SuperConstructorInvocation":
            expr.f["stmt_end"] = end
            return expr
        return J("ExpressionStatement", start, end, expr=expr)

    def _looks_like_local_class(self) -> bool:
        i = 0
        while self.peek(i).value in MODIFIER_KEYWORDS:
            i += 1
        return self.peek(i).value in ("class", "interface")

    def try_parse_local_var_decl(self) -> Optional[J]:
        save = self.pos
        save_tok = self.toks[self.pos]
        try:
            start = self.peek().start
            mods = self.parse_modifiers()
            typ = self.parse_type()
            if not self.at_kind("ident"):
                raise ParseError("not a decl")
            nxt_after_name = self.peek(1).value
            if nxt_after_name not in ("=", ",", ";", "["):
                raise ParseError("not a decl")
            frags = self.parse_fragments()
            end = self.expect(";").end
            return J("VarDeclStmt", start, end, modifiers=mods, type=typ,
                     fragments=frags)
        except ParseError:
            self.pos = save
            self.toks[save] = save_tok
            return None

    def parse_fragments(self) -> List[J]:
        frags: List[J] = []
        while True:
            name_tok = self.advance()
            if name_tok.kind != "ident":
                raise ParseError(f"bad fragment name {name_tok.value!r}")
            name = J("SimpleName", name_tok.start, name_tok.end, name=name_tok.value)
            while self.at("[") and self.at("]", 1):  # C-style extra dims
                self.advance()
                self.advance()
            init = None
            if self.accept("="):
                # brace form `int[] b = {1, 2};` (JDT ArrayInitializer as
                # a fragment initializer, not an expression)
                if self.at("{"):
                    init = self.parse_array_initializer()
                else:
                    init = self.parse_expression()
            end = self.toks[self.pos - 1].end
            frags.append(J("VarDeclFragment", name_tok.start, end, name=name, init=init))
            if not self.accept(","):
                break
        return frags

    def parse_if(self) -> J:
        start = self.expect("if").start
        self.expect("(")
        cond = self.parse_expression()
        self.expect(")")
        then = self.parse_statement()
        else_stmt = None
        else_start = None
        if self.at("else"):
            self.advance()
            # the reference anchors the if's end at the else STATEMENT's
            # first token, not the `else` keyword (getEndLineNumber,
            # PEASTVisitor.java:126-129: elseStatement.getStartPosition()
            # - 1) — visible only when an unbraced else body sits on its
            # own line (found by the r4 ast_child reference trace)
            else_start = self.peek().start
            else_stmt = self.parse_statement()
        end = self.toks[self.pos - 1].end
        return J("If", start, end, cond=cond, then=then, else_stmt=else_stmt,
                 else_start=else_start)

    def parse_while(self) -> J:
        start = self.expect("while").start
        self.expect("(")
        cond = self.parse_expression()
        self.expect(")")
        body = self.parse_statement()
        return J("While", start, body.end, cond=cond, body=body)

    def parse_do(self) -> J:
        start = self.expect("do").start
        body = self.parse_statement()
        self.expect("while")
        self.expect("(")
        cond = self.parse_expression()
        self.expect(")")
        end = self.expect(";").end
        return J("Do", start, end, cond=cond, body=body)

    def parse_for(self) -> J:
        start = self.expect("for").start
        self.expect("(")
        # enhanced for?
        save = self.pos
        save_tok = self.toks[self.pos]
        try:
            p_start = self.peek().start
            mods = self.parse_modifiers()
            typ = self.parse_type()
            if not self.at_kind("ident") or not self.at(":", 1):
                raise ParseError("not enhanced for")
            name_tok = self.advance()
            param = J("SingleVarDecl", p_start, name_tok.end, modifiers=mods,
                      type=typ, name=name_tok.value)
            self.expect(":")
            expr = self.parse_expression()
            self.expect(")")
            body = self.parse_statement()
            return J("EnhancedFor", start, body.end, param=param, expr=expr,
                     body=body)
        except ParseError:
            self.pos = save
            self.toks[save] = save_tok
        # classic for
        inits: List[J] = []
        if not self.at(";"):
            decl = self.try_parse_for_init_decl()
            if decl is not None:
                inits.append(decl)
            else:
                inits.append(self.parse_expression())
                while self.accept(","):
                    inits.append(self.parse_expression())
        self.expect(";")
        cond = None if self.at(";") else self.parse_expression()
        self.expect(";")
        updaters: List[J] = []
        if not self.at(")"):
            updaters.append(self.parse_expression())
            while self.accept(","):
                updaters.append(self.parse_expression())
        self.expect(")")
        body = self.parse_statement()
        return J("For", start, body.end, inits=inits, cond=cond,
                 updaters=updaters, body=body)

    def try_parse_for_init_decl(self) -> Optional[J]:
        save = self.pos
        save_tok = self.toks[self.pos]
        try:
            start = self.peek().start
            mods = self.parse_modifiers()
            typ = self.parse_type()
            if not self.at_kind("ident"):
                raise ParseError("not a decl")
            if self.peek(1).value not in ("=", ",", ";", "["):
                raise ParseError("not a decl")
            frags = self.parse_fragments()
            end = self.toks[self.pos - 1].end
            return J("VarDeclExpr", start, end, modifiers=mods, type=typ,
                     fragments=frags)
        except ParseError:
            self.pos = save
            self.toks[save] = save_tok
            return None

    def parse_switch(self) -> J:
        start = self.expect("switch").start
        self.expect("(")
        expr = self.parse_expression()
        self.expect(")")
        self.expect("{")
        stmts: List[J] = []
        while not self.at("}") and not self.at_kind("eof"):
            if self.at("case") or self.at("default"):
                c_start = self.peek().start
                exprs: List[Optional[J]] = []
                if self.accept("default"):
                    exprs.append(None)
                else:
                    self.expect("case")
                    exprs.append(self.parse_case_expression())
                    while self.accept(","):
                        exprs.append(self.parse_case_expression())
                if self.at("->"):
                    self.advance()  # arrow case: treat like ':' (JLS14 form)
                else:
                    self.expect(":")
                c_end = self.toks[self.pos - 1].end
                stmts.append(J("SwitchCase", c_start, c_end, exprs=exprs))
            else:
                stmts.append(self.parse_statement())
        end = self.expect("}").end
        return J("Switch", start, end, expr=expr, statements=stmts)

    def parse_case_expression(self) -> J:
        # case labels are constant expressions (no ':' operator ambiguity
        # since ternary needs '?' first)
        return self.parse_expression(no_ternary_colon=False)

    def parse_try(self) -> J:
        start = self.expect("try").start
        if self.at("("):  # try-with-resources: parsed, not visited by ref
            self.skip_balanced("(", ")")
        body = self.parse_block()
        catches: List[J] = []
        first_catch_start = None
        while self.at("catch"):
            c_start = self.peek().start
            if first_catch_start is None:
                first_catch_start = c_start
            self.advance()
            self.expect("(")
            e_start = self.peek().start
            mods = self.parse_modifiers()
            type_text_parts = [self.parse_type()["text"]]
            while self.accept("|"):  # union type, rendered 'A|B' by JDT
                type_text_parts.append(self.parse_type()["text"])
            type_text = "|".join(type_text_parts)
            name_tok = self.advance()
            e_end = name_tok.end
            self.expect(")")
            exc = J("SingleVarDecl", e_start, e_end, modifiers=mods,
                    type=J("Type", e_start, e_end, text=type_text),
                    name=name_tok.value, in_catch=True)
            c_body = self.parse_block()
            catches.append(J("Catch", c_start, c_body.end, exc=exc, body=c_body))
        finally_block = None
        finally_block_start = None
        if self.at("finally"):
            self.advance()
            finally_block = self.parse_block()
            finally_block_start = finally_block.start
        end = self.toks[self.pos - 1].end
        return J("Try", start, end, body=body, catches=catches,
                 finally_block=finally_block,
                 first_catch_start=first_catch_start,
                 finally_block_start=finally_block_start)

    # -------------------------------------------------------- expressions

    def parse_expression(self, no_ternary_colon: bool = False) -> J:
        return self.parse_assignment()

    def parse_assignment(self) -> J:
        left = self.parse_ternary()
        if self.peek().value in ASSIGN_OPS:
            op_tok = self.advance()
            right = self.parse_assignment()
            return J("Assignment", left.start, right.end, left=left,
                     op=op_tok.value, right=right)
        return left

    def parse_ternary(self) -> J:
        cond = self.parse_binary(0)
        if self.at("?"):
            self.advance()
            then = self.parse_expression()
            self.expect(":")
            else_e = self.parse_expression()
            return J("Conditional", cond.start, else_e.end, cond=cond,
                     then=then, else_e=else_e)
        return cond

    def parse_binary(self, level: int = 0) -> J:
        """Precedence climbing (one parse_unary per operand instead of a
        10-level descent per primary — ~10%% of total kernel time)."""
        return self._climb(self.parse_unary(), level)

    def _climb(self, left: J, min_prec: int) -> J:
        while True:
            v = self.peek().value
            prec = _BINARY_PREC.get(v)
            if prec is None or prec < min_prec:
                return left
            if v == "instanceof":
                self.advance()
                rhs = self.parse_instanceof_rhs()
                left = J("InstanceOf", left.start,
                         self.toks[self.pos - 1].end, left=left, rhs=rhs)
                continue
            self.advance()
            right = self.parse_unary()
            nxt = _BINARY_PREC.get(self.peek().value)
            if nxt is not None and nxt > prec:
                right = self._climb(right, prec + 1)
            if left.t == "Infix" and left["op"] == v and not left.get("closed"):
                # JDT folds same-operator runs into extendedOperands
                left.f["extended"].append(right)
                left.end = right.end
            else:
                left = J("Infix", left.start, right.end, op=v, left=left,
                         right=right, extended=[])

    def parse_instanceof_rhs(self) -> Optional[J]:
        """instanceof RHS: JDT visits the Type; SimpleType名 falls through to
        visit(SimpleName)/visit(QualifiedName) (no ArrayType/generic
        override match -> dropped, see PESafeStack drop rules)."""
        typ = self.parse_type()
        # pattern variable (JLS16): `x instanceof T t` -> name dropped
        if self.at_kind("ident"):
            self.advance()
        text = typ["text"]
        if "[" in text or "<" in text:
            return None
        if "." in text:
            parts = text.split(".")
            node = J("SimpleName", typ.start, typ.end, name=parts[0])
            for p in parts[1:]:
                node = J("QualifiedName", typ.start, typ.end, qualifier=node,
                         name=J("SimpleName", typ.start, typ.end, name=p))
            return node
        if text in PRIMITIVES:
            return None
        return J("SimpleName", typ.start, typ.end, name=text)

    def parse_unary(self) -> J:
        t = self.peek()
        v = t.value
        if v in ("+", "-", "!", "~", "++", "--"):
            self.advance()
            operand = self.parse_unary()
            return J("Prefix", t.start, operand.end, op=v, operand=operand)
        if v == "(":
            cast = self.try_parse_cast()
            if cast is not None:
                return cast
        return self.parse_postfix()

    def try_parse_cast(self) -> Optional[J]:
        save = self.pos
        save_toks = self.toks[self.pos:self.pos + 1]
        try:
            start = self.expect("(").start
            typ = self.parse_type()
            self.expect(")")
            nxt = self.peek()
            operand_start = (
                nxt.kind in ("ident", "number", "string", "char")
                or nxt.value in ("(", "!", "~", "this", "super", "new")
            )
            is_primitive = typ["text"].split("[")[0] in PRIMITIVES
            if not operand_start and not (is_primitive and nxt.value in ("+", "-")):
                raise ParseError("not a cast")
            operand = self.parse_unary()
            return J("Cast", start, operand.end, type=typ, operand=operand)
        except ParseError:
            self.pos = save
            self.toks[save:save + 1] = save_toks
            return None

    def parse_postfix(self) -> J:
        node = self.parse_primary()
        while True:
            t = self.peek()
            v = t.value
            if v == ".":
                nxt = self.peek(1)
                if nxt.value == "class":
                    # Name '.' class -> TypeLiteral
                    self.advance()
                    end = self.advance().end
                    node = J("TypeLiteral", node.start, end, base=node)
                    continue
                if nxt.value == "this":
                    # Outer.this -> unsupported
                    self.advance()
                    self.advance()
                    node = J("Unknown", node.start, self.toks[self.pos - 1].end)
                    continue
                if nxt.value == "new":
                    # qualified instance creation `outer.new Inner(args)`:
                    # consume the WHOLE creation (type, args, optional anon
                    # body) so the statement survives; the Unknown node is
                    # dropped subtree-locally (PESafeStack-style)
                    self.advance()
                    self.advance()
                    self.parse_type()
                    if self.at("("):
                        self.parse_arguments()
                    if self.at("{"):
                        self.skip_balanced("{", "}")
                    node = J("Unknown", node.start, self.toks[self.pos - 1].end)
                    continue
                if nxt.value == "<":
                    # qualified generic method call x.<T>m(...) -> drop generics
                    self.advance()
                    self.parse_type_arguments()
                    name_tok = self.advance()
                    args = self.parse_arguments()
                    node = J("MethodInvocation", node.start,
                             self.toks[self.pos - 1].end, expr=node,
                             name=J("SimpleName", name_tok.start, name_tok.end,
                                    name=name_tok.value), args=args)
                    continue
                if nxt.kind in ("ident", "keyword"):
                    self.advance()
                    name_tok = self.advance()
                    name = J("SimpleName", name_tok.start, name_tok.end,
                             name=name_tok.value)
                    if self.at("("):
                        args = self.parse_arguments()
                        node = J("MethodInvocation", node.start,
                                 self.toks[self.pos - 1].end, expr=node,
                                 name=name, args=args)
                    else:
                        if node.t in ("SimpleName", "QualifiedName"):
                            node = J("QualifiedName", node.start, name_tok.end,
                                     qualifier=node, name=name)
                        else:
                            node = J("FieldAccess", node.start, name_tok.end,
                                     expr=node, name=name)
                    continue
                raise ParseError(f"unexpected '.{nxt.value}' at {nxt.start}")
            if v == "[":
                self.advance()
                index = self.parse_expression()
                end = self.expect("]").end
                node = J("ArrayAccess", node.start, end, array=node, index=index)
                continue
            if v in ("++", "--"):
                end = self.advance().end
                node = J("Postfix", node.start, end, operand=node, op=v)
                continue
            if v == "::":
                # method reference -> unsupported (dropped by builder)
                self.advance()
                self.advance()
                node = J("Unknown", node.start, self.toks[self.pos - 1].end)
                continue
            return node

    def parse_arguments(self) -> List[J]:
        self.expect("(")
        args: List[J] = []
        while not self.at(")"):
            args.append(self.parse_expression())
            if not self.accept(","):
                break
        self.expect(")")
        return args

    def _lambda_lookahead(self) -> bool:
        """At '(' — check whether the parenthesized region is a lambda
        parameter list (matching ')' followed by '->')."""
        depth = 0
        i = 0
        while True:
            t = self.peek(i)
            if t.kind == "eof":
                return False
            if t.value == "(":
                depth += 1
            elif t.value == ")":
                depth -= 1
                if depth == 0:
                    return self.peek(i + 1).value == "->"
            i += 1

    def parse_primary(self) -> J:
        t = self.peek()
        v = t.value
        k = t.kind
        if k == "number":
            self.advance()
            return J("NumberLiteral", t.start, t.end, token=v)
        if k == "string":
            self.advance()
            return J("StringLiteral", t.start, t.end, raw=v)
        if k == "char":
            self.advance()
            return J("CharLiteral", t.start, t.end, raw=v)
        if v == "true" or v == "false":
            self.advance()
            return J("BooleanLiteral", t.start, t.end, value=v)
        if v == "null":
            self.advance()
            return J("NullLiteral", t.start, t.end)
        if v == "this":
            self.advance()
            if self.at("("):
                args = self.parse_arguments()
                return J("ConstructorInvocation", t.start,
                         self.toks[self.pos - 1].end, args=args)
            return J("This", t.start, t.end)
        if v == "super":
            self.advance()
            if self.at("("):
                args = self.parse_arguments()
                return J("SuperConstructorInvocation", t.start,
                         self.toks[self.pos - 1].end, args=args, qualifier=None)
            self.expect(".")
            name_tok = self.advance()
            name = J("SimpleName", name_tok.start, name_tok.end, name=name_tok.value)
            if self.at("("):
                args = self.parse_arguments()
                return J("SuperMethodInvocation", t.start,
                         self.toks[self.pos - 1].end, name=name, args=args)
            return J("SuperFieldAccess", t.start, name_tok.end, name=name)
        if v == "new":
            return self.parse_new()
        if v == "switch":
            # switch expression (JLS14) -> unsupported
            self.advance()
            self.skip_balanced("(", ")")
            end = self.skip_balanced("{", "}")
            return J("Unknown", t.start, end)
        if v == "(":
            if self._lambda_lookahead():
                return self.parse_lambda_parenthesized()
            start = self.advance().start
            inner = self.parse_expression()
            end = self.expect(")").end
            return J("Parenthesized", start, end, expr=inner)
        if k == "ident":
            if self.at("->", 1):
                name_tok = self.advance()
                arrow = self.advance()
                body = self.parse_lambda_body()
                param = J("VarDeclFragment", name_tok.start, name_tok.end,
                          name=J("SimpleName", name_tok.start, name_tok.end,
                                 name=name_tok.value), init=None)
                return J("Lambda", name_tok.start, body.end, params=[param],
                         body=body, parens=False)
            self.advance()
            name = J("SimpleName", t.start, t.end, name=v)
            if self.at("("):  # unqualified call: foo(args)
                args = self.parse_arguments()
                return J("MethodInvocation", t.start,
                         self.toks[self.pos - 1].end, expr=None, name=name,
                         args=args)
            return name
        if v in PRIMITIVES:
            # primitive '.class' (int.class) or array class literal
            self.advance()
            text = v
            while self.at("[") and self.at("]", 1):
                self.advance()
                self.advance()
                text += "[]"
            if self.at(".") and self.at("class", 1):
                self.advance()
                end = self.advance().end
                return J("TypeLiteral", t.start, end, base=None)
            raise ParseError(f"unexpected primitive {v!r} at {t.start}")
        raise ParseError(f"unexpected token {v!r} at offset {t.start}")

    def parse_lambda_parenthesized(self) -> J:
        start = self.expect("(").start
        params: List[J] = []
        typed = False
        while not self.at(")"):
            self.parse_modifiers()
            # inferred param: ident followed by ',' or ')'
            if self.at_kind("ident") and self.peek(1).value in (",", ")"):
                name_tok = self.advance()
                params.append(J("VarDeclFragment", name_tok.start, name_tok.end,
                                name=J("SimpleName", name_tok.start,
                                       name_tok.end, name=name_tok.value),
                                init=None))
            else:
                typed = True
                self.parse_type()
                name_tok = self.advance()
                params.append(J("VarDeclFragment", name_tok.start, name_tok.end,
                                name=J("SimpleName", name_tok.start,
                                       name_tok.end, name=name_tok.value),
                                init=None))
            if not self.accept(","):
                break
        self.expect(")")
        self.expect("->")
        body = self.parse_lambda_body()
        return J("Lambda", start, body.end, params=params, body=body,
                 parens=True, typed=typed)

    def parse_lambda_body(self) -> J:
        if self.at("{"):
            return self.parse_block()
        return self.parse_expression()

    def parse_new(self) -> J:
        start = self.expect("new").start
        typ = self.parse_type()
        type_text = typ["text"]
        if type_text.endswith("[]") or self.at("["):
            # array creation; parse_type may have consumed [] pairs already
            dims_from_type = 0
            base = type_text
            while base.endswith("[]"):
                base = base[:-2]
                dims_from_type += 1
            extra_dims = dims_from_type
            while self.at("["):
                self.advance()
                if not self.at("]"):
                    self.parse_expression()  # dimension expr: not rendered
                self.expect("]")
                extra_dims += 1
            initializer = None
            if self.at("{"):
                initializer = self.parse_array_initializer()
            end = self.toks[self.pos - 1].end
            return J("ArrayCreation", start, end, element_type=base,
                     dims=extra_dims, initializer=initializer)
        args = self.parse_arguments() if self.at("(") else []
        anon = None
        if self.at("{"):
            anon = self.parse_anonymous_class_body()
        end = self.toks[self.pos - 1].end
        return J("ClassInstanceCreation", start, end, type=typ, args=args,
                 expr=None, anon=anon)

    def parse_anonymous_class_body(self) -> J:
        start = self.expect("{").start
        body: List[J] = []
        while not self.at("}") and not self.at_kind("eof"):
            member = self.parse_class_member("<anonymous>")
            if member is not None:
                body.append(member)
        end = self.expect("}").end
        return J("AnonymousClassBody", start, end, body=body)

    def parse_array_initializer(self) -> J:
        start = self.expect("{").start
        exprs: List[J] = []
        while not self.at("}"):
            if self.at("{"):
                exprs.append(self.parse_array_initializer())
            else:
                exprs.append(self.parse_expression())
            if not self.accept(","):
                break
        end = self.expect("}").end
        return J("ArrayInitializer", start, end, exprs=exprs)


def parse_java(source: str) -> J:
    return Parser(source).parse_compilation_unit()
