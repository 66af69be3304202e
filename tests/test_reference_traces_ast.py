"""Reference-traced ast_child goldens for the 9 fixtures whose PE-tree
edge sets were previously kernel-frozen (VERDICT r3 #5).

Every golden below is DERIVED FROM THE REFERENCE VISITOR RULES, not from
running the kernel: the small DSL in this file re-implements, in ~100
lines of plain Python with file:line citations, exactly how
PEASTVisitor.java constructs each ProgramElementInfo's text / span /
children, and each fixture's tree is hand-transcribed from its Java
source by applying those rules statement by statement. The kernel is
only the system under test (ast_edge_texts runs it); the expected edge
multisets come from the DSL expansion.

Rules encoded (citations are into /root/reference/src/main/java):
- spans: getLineNumber(start) .. getLineNumber(start+length), EXCEPT
  IfStatement (else present -> line of elseStatement.start-1, i.e. the
  line holding `else`, or the else-body's indent line when unbraced)
  and TryStatement (line of first catch clause start-1)
  (PEASTVisitor.java:115-152); a MethodDeclaration's extent includes
  its annotations (JDT source range), so @Override lines open the span.
- MethodDeclaration: text = modifiers (annotations included, each + a
  space) + returnType + " " + name + " (" + params joined "," + ") " +
  body; children = params + spliced body statements
  (PEASTVisitor.java:261-302; MethodInfo.setStatement splices non-empty
  SimpleBlocks, MethodInfo.java).
- Block: SimpleBlock "{\n" + stmt texts each + "\n" + "}"; a bare block
  statement stays ONE node (addStatement never splices), while
  setStatement/setElseStatement splice non-empty SimpleBlocks
  (PEASTVisitor.java:1697-1724; StatementInfo.java:205-233).
- IfStatement: children = condition + spliced-then + spliced-else; the
  node text embeds the PRE-retext condition; the condition node itself
  is retexted to "if " + text afterwards (PEASTVisitor.java:1384-1426).
  While retexts "while " (:1563-1595); For/Do never retext.
- TryStatement: "try " + body + catch texts + finally; children = body
  spliced + each catch + finally (:1523-1561).
- CatchClause: text "catch ( Type name )" + catchBlock.getText() —
  which is STILL "" at that point, so the body text never appears
  (:1727-1758); children = exception VariableDeclarationInfo (whose
  only child is its TypeInfo) + spliced body.
- SingleVariableDeclaration: "mods Type name" ("catch ( Type name )"
  under a CatchClause); one TypeInfo child (:1760-1792).
- VariableDeclarationStatement: "mods Type frag,frag;"; children
  TypeInfo + fragments; a fragment's extra dims are NOT rendered
  (:1173-1211). Fragment: "name" / "name = init", children name
  (+ init) (:1214-1242). VariableDeclarationExpression: "Type frags"
  (:1145-1170).
- MethodInvocation: "qual.name(a,b)" (no space after comma); children =
  qualifier (setQualifier) + name + args (:981-1029). An argument whose
  visit pushes != 1 element is DROPPED from children AND text — e.g. a
  method reference pushes two SimpleNames and PESafeStack.pop returns
  null (PESafeStack.java:41-57). A lambda argument IS kept: it builds
  one MethodInfo whose child is its body expression, parameters only in
  the text (:305-354).
- InfixExpression: " ( l op r )" + " op e" per extended operand, with
  the SAME OperatorInfo instance re-appended per extension — one
  operator node, 1+n_ext parent edges; operator span = the infix
  node's own span (:636-686).
- Assignment "lhs = rhs" with operator child (:754-783); FieldAccess
  "e.name" children e + name (:611-633); QualifiedName likewise via
  setQualifier (:562-586); Cast "(T)e" children TypeInfo + e
  (:787-812); ClassInstanceCreation "new T(a,b)" children TypeInfo +
  args (:814-859); Trinomial "c ? t : e" (:862-891); Prefix "!x" /
  Postfix "x++" with operator child (:442-490);
  Parenthesized "(e)" (:1033-1053); ArrayAccess "a[i]" (:381-405);
  ArrayCreation text "new T[]" where T already carries the dims
  ("new String[][]"), the initializer child's text is NOT appended
  (StringBuilder.append(this) while this.text is still "" —
  :688-714, ProgramElementInfo.java:97); ArrayInitializer "{a,b}"
  (:717-741); TypeLiteral has NO text — `X.class` renders as ""
  (:552-560, no setText; default "" from ProgramElementInfo.java:97);
  Instanceof right operand is a TYPE node with no visitor, so its
  inner SimpleName bubbles up as the child (:956-978 + PESafeStack);
  StringLiteral quotes the DECODED value (:492-501); This "this"
  (:1133-1143); Return "return e;" (:1055-1081);
  ExpressionStatement "e;" (:933-953).
"""

from __future__ import annotations

import glob
from collections import Counter

from propertygraph_spark.kernel.extract import extract_document

FIXDIR = "/root/reference/testcase"


def ast_edge_texts(name: str) -> Counter:
    """Kernel-side multiset of (subj_text, subj_span, obj_text,
    obj_span) over the ast_child family (system under test)."""
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


# ------------------------------------------------------------------ DSL

class N:
    """One ProgramElementInfo: text, line span, ordered children."""

    __slots__ = ("text", "sl", "el", "children")

    def __init__(self, text, sl, el, children=()):
        self.text, self.sl, self.el = text, sl, el
        self.children = list(children)

    @property
    def span(self):
        return f"{self.sl}-{self.el}"


def expand(roots) -> Counter:
    """Edge multiset of the forest — one edge per (parent, child-slot);
    the same child object in two slots yields two edges (the infix
    extended-operand quirk)."""
    out: Counter = Counter()
    stack = list(roots)
    seen: set = set()
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        for ch in node.children:
            out[(node.text, node.span, ch.text, ch.span)] += 1
            stack.append(ch)
    return out


def nm(t, line):       # SimpleName :589
    return N(t, line, line)


def st(v, line):       # StringLiteral :492 — v is the decoded value
    return N('"' + v + '"', line, line)


def num(t, line):      # NumberLiteral :431
    return N(t, line, line)


def op(t, sl, el=None):  # OperatorInfo — span = owning node's span
    return N(t, sl, el or sl)


def ty(t, sl, el=None):  # TypeInfo built directly from Type.toString()
    return N(t, sl, el or sl)


def this(line):
    return N("this", line, line)


def null(line):
    return N("null", line, line)


def boolean(t, line):  # :743
    return N(t, line, line)


def typelit(line):     # :552 — no setText, text stays ""
    return N("", line, line)


def inv(line, name, args=(), qual=None, el=None):  # :981
    nn = name if isinstance(name, N) else nm(name, line)
    text = ((qual.text + ".") if qual is not None else "") \
        + nn.text + "(" + ",".join(a.text for a in args) + ")"
    ch = ([qual] if qual is not None else []) + [nn] + list(args)
    return N(text, line, el or line, ch)


def infix(line, left, o, right, ext=(), el=None):  # :636
    el = el or line
    opn = op(o, line, el)
    text = " ( " + left.text + " " + o + " " + right.text + " )"
    ch = [left, opn, right]
    for e in ext:
        text += " " + o + " " + e.text
        ch += [opn, e]  # SAME operator instance re-appended
    return N(text, line, el, ch)


def assign(line, lhs, rhs, o="=", el=None):  # :754
    return N(lhs.text + " " + o + " " + rhs.text, line, el or line,
             [lhs, op(o, line, el), rhs])


def fieldacc(line, e, name):  # :611
    return N(e.text + "." + name, line, line, [e, nm(name, line)])


def qn(line, qual, name):     # :562
    return N(qual.text + "." + name, line, line, [qual, nm(name, line)])


def cast(line, t, e):         # :787
    return N("(" + t + ")" + e.text, line, line, [ty(t, line), e])


def cic(line, t, args=(), el=None):  # :814
    return N("new " + t + "(" + ",".join(a.text for a in args) + ")",
             line, el or line, [ty(t, line), *args])


def arrcre(line, elem, init=None, dims=1):  # :688
    t = elem + "[]" * dims
    ch = [ty(t, line)]
    if init is not None:
        ch.append(init)  # child kept, text NOT appended (still-"" self)
    return N("new " + t + "[]", line, line, ch)


def arrinit(line, exprs):     # :717
    return N("{" + ",".join(e.text for e in exprs) + "}",
             line, line, list(exprs))


def arracc(line, arr, idx):   # :381
    return N(arr.text + "[" + idx.text + "]", line, line, [arr, idx])


def prefix(line, o, operand):  # :467
    return N(o + operand.text, line, line, [op(o, line), operand])


def postfix(line, operand, o):  # :442
    return N(operand.text + o, line, line, [operand, op(o, line)])


def instof(line, left, tname):  # :956 + PESafeStack type fallthrough
    return N(left.text + " instanceof " + tname, line, line,
             [left, nm(tname, line)])


def ternary(line, c, t, e):   # :862
    return N(c.text + " ? " + t.text + " : " + e.text, line, line,
             [c, t, e])


def frag(line, name, init=None):  # :1214
    if init is None:
        return N(name, line, line, [nm(name, line)])
    return N(name + " = " + init.text, line, line, [nm(name, line), init])


def vde(line, t, frags):      # :1145 — for-initializer form
    return N(t + " " + "".join(f.text for f in frags), line, line,
             [ty(t, line), *frags])


def lam(line, params_text, body):  # :305 — body child only
    return N(params_text + " -> " + body.text, line, line, [body])


def exprstmt(line, e, el=None):  # :933
    return N(e.text + ";", line, el or line, [e])


def ret(line, e=None):        # :1055
    if e is None:
        return N("return;", line, line)
    return N("return " + e.text + ";", line, line, [e])


def vds(line, t, frags, mods=(), el=None):  # :1173
    text = "".join(m + " " for m in mods) + t + " " \
        + ",".join(f.text for f in frags) + ";"
    return N(text, line, el or line, [ty(t, line, el), *frags])


def block_text(stmts):
    return "{\n" + "".join(s.text + "\n" for s in stmts) + "}"


def bareblock(sl, el, stmts):  # :1697 via addStatement — stays a node
    return N(block_text(stmts), sl, el, stmts)


def ifstmt(sl, el, cond, then, els=(), then_braced=True,
           else_braced=True):  # :1384
    tt = block_text(then) if then_braced else "".join(
        s.text for s in then)
    et = ("" if not els else
          (block_text(els) if else_braced else "".join(
              s.text for s in els)))
    text = "if (" + cond.text + ") " + tt + et
    cond.text = "if " + cond.text  # retext AFTER composing (:1402)
    return N(text, sl, el, [cond, *then, *els])


def forstmt(sl, el, inits, cond, upds, body):  # :1320 — no retext
    text = ("for (" + ",".join(i.text for i in inits) + "; "
            + (cond.text if cond is not None else "") + "; "
            + ",".join(u.text for u in upds) + ")" + block_text(body))
    ch = [*inits] + ([cond] if cond is not None else []) + [*upds, *body]
    return N(text, sl, el, ch)


def catchstmt(sl, el, exc_type, exc_name, body):  # :1727 + :1760
    # the exception's own text is already "catch ( T n )" (the
    # CatchClause parent form, :1777-1782) and the clause wraps it in
    # ANOTHER "catch (...) " — a doubled-keyword reference quirk; the
    # body text never lands in the clause text (getText() is "" at the
    # append, :1752)
    inner = "catch ( " + exc_type + " " + exc_name + " )"
    exc = N(inner, sl, sl, [ty(exc_type, sl)])
    return N("catch (" + inner + ") ", sl, el, [exc, *body])


def trystmt(sl, el, body, catches, fin=None):  # :1523
    text = "try " + block_text(body) + "".join(c.text for c in catches)
    if fin is not None:
        text += fin.text
    ch = [*body, *catches] + ([fin] if fin is not None else [])
    return N(text, sl, el, ch)


def method(sl, el, sig_mods, rettype, name, params, stmts):  # :261
    ptext = ",".join(p.text for p in params)
    text = "".join(m + " " for m in sig_mods) \
        + ((rettype + " ") if rettype is not None else "") \
        + name + " (" + ptext + ") " + block_text(stmts)
    return N(text, sl, el, [*params, *stmts])


def param(line, t, name, mods=()):  # :1760 non-catch form
    return N("".join(m + " " for m in mods) + t + " " + name,
             line, line, [ty(t, line)])


# --------------------------------------------------- EdgeOperation.java

def edgeop_stmt(line, field):
    """this.<field> = Jenkins.getInstance().getItemByFullName(arg, X.class);"""
    lhs = fieldacc(line, this(line), field)
    c1 = inv(line, "getInstance", qual=nm("Jenkins", line))
    if field == "source":
        arg0 = inv(line, "trim", qual=nm("sourceJobName", line))
    else:
        arg0 = nm("targetJobName", line)
    c2 = inv(line, "getItemByFullName", [arg0, typelit(line)], qual=c1)
    return exprstmt(line, assign(line, lhs, c2))


def check_perm(line, recv):
    return exprstmt(line, inv(
        line, "checkPermission",
        [qn(line, nm("Permission", line), "CONFIGURE")],
        qual=nm(recv, line)))


EDGEOP = method(
    2, 7, ["public"], None, "EdgeOperation",
    [param(2, "String", "sourceJobName"), param(2, "String", "targetJobName")],
    [edgeop_stmt(3, "source"), edgeop_stmt(4, "target"),
     check_perm(5, "source"), check_perm(6, "target")])


def test_edgeoperation_ast_matches_reference_trace():
    assert ast_edge_texts("EdgeOperation.java") == expand([EDGEOP])


# -------------------------------------- BaseDataStreamMarshaller{Old,New}

def marshaller_stmts(l_clazz, l_ctor, l_ret):
    clazz_init = inv(
        l_clazz, "forName",
        [nm("className", l_clazz), boolean("false", l_clazz),
         inv(l_clazz, "getClassLoader", qual=typelit(l_clazz))],
        qual=nm("Class", l_clazz))
    s_clazz = vds(l_clazz, "Class", [frag(l_clazz, "clazz", clazz_init)])
    ctor_init = inv(
        l_ctor, "getConstructor",
        [arrcre(l_ctor, "Class", arrinit(l_ctor, [typelit(l_ctor)]))],
        qual=nm("clazz", l_ctor))
    s_ctor = vds(l_ctor, "Constructor",
                 [frag(l_ctor, "constructor", ctor_init)])
    s_ret = ret(l_ret, cast(
        l_ret, "Throwable",
        inv(l_ret, "newInstance",
            [arrcre(l_ret, "Object",
                    arrinit(l_ret, [nm("message", l_ret)]))],
            qual=nm("constructor", l_ret))))
    return s_clazz, s_ctor, s_ret


def throwable_catch(sl, el, l_ret):
    return catchstmt(sl, el, "Throwable", "e", [ret(l_ret, cic(
        l_ret, "Throwable",
        [infix(l_ret, nm("className", l_ret), "+", st(": ", l_ret),
               [nm("message", l_ret)])]))])


MARSH_OLD = method(
    3, 11, ["private"], "Throwable", "createThrowable",
    [param(3, "String", "className"), param(3, "String", "message")],
    [trystmt(4, 8, list(marshaller_stmts(5, 6, 7)),
             [throwable_catch(8, 10, 9)])])

_new_body = marshaller_stmts(5, 7, 8)
MARSH_NEW = method(
    3, 14, ["private"], "Throwable", "createThrowable",
    [param(3, "String", "className"), param(3, "String", "message")],
    [trystmt(4, 9,
             [_new_body[0],
              exprstmt(6, inv(6, "validateIsThrowable",
                              [nm("clazz", 6)],
                              qual=nm("OpenWireUtil", 6))),
              _new_body[1], _new_body[2]],
             [catchstmt(9, 11, "IllegalArgumentException", "e",
                        [ret(10, nm("e", 10))]),
              throwable_catch(11, 13, 12)])])


def test_marshaller_old_ast_matches_reference_trace():
    assert ast_edge_texts("BaseDataStreamMarshallerOld.java") == \
        expand([MARSH_OLD])


def test_marshaller_new_ast_matches_reference_trace():
    assert ast_edge_texts("BaseDataStreamMarshallerNew.java") == \
        expand([MARSH_NEW])


# ------------------------------------------------ BaseDataMarshaller.java

def _bm_index_vds(line):
    return vds(line, "short", [frag(line, "index", inv(
        line, "readShort", qual=nm("dataIn", line)))])


def _bm_unmarshal(line):
    return inv(line, "tightUnmarshalNestedObject",
               [nm("dataIn", line), nm("bs", line)],
               qual=nm("wireFormat", line))


BASE_MARSH = method(
    2, 17, ["protected"], "DataStructure", "tightUnmarsalCachedObject",
    [param(2, "OpenWireFormat", "wireFormat"),
     param(2, "DataInput", "dataIn"), param(3, "BooleanStream", "bs")],
    [ifstmt(
        4, 14,
        inv(4, "isCacheEnabled", qual=nm("wireFormat", 4)),
        [ifstmt(
            5, 10,
            inv(5, "readBoolean", qual=nm("bs", 5)),
            [_bm_index_vds(6),
             vds(7, "DataStructure", [frag(7, "object", _bm_unmarshal(7))]),
             exprstmt(8, inv(8, "setInUnmarshallCache",
                             [nm("index", 8), nm("object", 8)],
                             qual=nm("wireFormat", 8))),
             ret(9, nm("object", 9))],
            [_bm_index_vds(11),
             ret(12, inv(12, "getFromUnmarshallCache",
                         [nm("index", 12)], qual=nm("wireFormat", 12)))])],
        [ret(15, _bm_unmarshal(15))])])


def test_base_marshaller_ast_matches_reference_trace():
    assert ast_edge_texts("BaseDataMarshaller.java") == expand([BASE_MARSH])


# ----------------------------------------------------------- MyTest.java
# Only test5 is live (the rest of the file is commented out). The bare
# nested blocks stay single SimpleBlock nodes (addStatement, no splice).

def _println(line, argname):
    return exprstmt(line, inv(
        line, "println", [nm(argname, line)],
        qual=qn(line, nm("System", line), "out")))


MYTEST5 = method(
    55, 68, ["public"], "void", "test5", [param(55, "int", "x")],
    [vds(56, "ProcessGroup",
         [frag(56, "parentGroup", inv(56, "get", qual=nm("parent", 56)))],
         mods=["final"]),
     exprstmt(58, assign(58, nm("x", 58), num("1", 58))),
     bareblock(59, 67, [
         _println(60, "x"),
         vds(61, "int", [frag(61, "x", num("2", 61))]),
         _println(62, "x"),
         bareblock(63, 66, [
             exprstmt(64, assign(64, nm("x", 64), num("3", 64))),
             _println(65, "x")])])])


def test_mytest_ast_matches_reference_trace():
    assert ast_edge_texts("MyTest.java") == expand([MYTEST5])


# ----------------------------------------------------- SqlInjection.java

def _split(line, arr_idx, pat, n=2):
    """retval[i].split("pat", 2) — ArrayAccess receiver."""
    return inv(line, "split", [st(pat, line), num(str(n), line)],
               qual=arracc(line, nm("retval", line), num(str(arr_idx), line)))


def _sql_len_ge2(line):
    return infix(line, qn(line, nm("retval", line), "length"), ">=",
                 num("2", line))


SQLINJ = method(
    2, 27, ["public"], "List<String>", "getUserList", [],
    [vds(3, "List<String>",
         [frag(3, "userlist", cic(3, "ArrayList<String>"))]),
     vds(4, "A", [frag(4, "ps", null(4))]),
     vds(5, "String", [frag(5, "authQuery", st("", 5))]),
     vds(6, "String", [frag(6, "retval")]),  # extra dims unrendered
     vds(7, "String", [frag(7, "tablename", st("", 7))]),
     vds(8, "String", [frag(8, "username", st("", 8))]),
     vds(9, "String", [frag(9, "userquery", st("", 9))]),
     exprstmt(11, assign(11, nm("retval", 11), arrcre(
         11, "String", arrinit(11, [st("a", 11), st("b", 11)])))),
     ifstmt(12, 21, _sql_len_ge2(12), [
         exprstmt(13, assign(13, nm("retval", 13),
                             _split(13, 1, "with|where"))),
         exprstmt(14, assign(14, nm("tablename", 14),
                             arracc(14, nm("retval", 14), num("0", 14)))),
         exprstmt(15, assign(15, nm("retval", 15), _split(15, 1, "where"))),
         ifstmt(16, 19, _sql_len_ge2(16),
                [exprstmt(17, assign(17, nm("retval", 17),
                                     _split(17, 1, "=")))],
                [exprstmt(19, assign(19, nm("retval", 19),
                                     _split(19, 0, "=")))],
                then_braced=False, else_braced=False),
         exprstmt(20, assign(20, nm("username", 20),
                             arracc(20, nm("retval", 20), num("0", 20)))),
     ]),
     exprstmt(23, assign(23, nm("userquery", 23), infix(
         23, st("select ", 23), "+", nm("username", 23),
         [st(" from ", 23), nm("tablename", 23)]))),
     exprstmt(24, assign(24, nm("ps", 24),
                         cic(24, "A", [nm("userquery", 24)]))),
     ret(26, nm("userlist", 26))])


def test_sqlinjection_ast_matches_reference_trace():
    assert ast_edge_texts("SqlInjection.java") == expand([SQLINJ])


# ----------------------------------------------- ActiveMQMapMessage.java
# Generic method: type parameters never reach the text (:274-276 renders
# modifiers + returnType2 + name only); the lambda argument becomes one
# MethodInfo child whose only child is its body expression (:305-354);
# `v instanceof UTF8Buffer` keeps the type's inner SimpleName (:956).

AMQMAP = method(
    16, 30, ['@SuppressWarnings("unchecked")', "protected"], "T",
    "doGetBody", [param(17, "Class<T>", "asType")],
    [exprstmt(18, inv(18, "storeContent")),
     vds(19, "ByteSequence",
         [frag(19, "content", inv(19, "getContent"))], mods=["final"]),
     vds(20, "Map<String,Object>",
         [frag(20, "map", ternary(
             20, infix(20, nm("content", 20), "!=", null(20)),
             inv(20, "deserialize", [nm("content", 20)]),
             null(20)))],
         mods=["final"]),
     ifstmt(24, 27, infix(
         24, infix(24, nm("map", 24), "!=", null(24)), "&&",
         prefix(24, "!", inv(24, "isEmpty", qual=nm("map", 24)))),
         [exprstmt(25, inv(
             25, "replaceAll",
             [lam(25, "(k,v)", ternary(
                 25, instof(25, nm("v", 25), "UTF8Buffer"),
                 inv(25, "toString", qual=nm("v", 25)), nm("v", 25)))],
             qual=nm("map", 25))),
          ret(26, cast(26, "T", nm("map", 26)))],
         [ret(28, null(28))])])


def test_activemq_ast_matches_reference_trace():
    assert ast_edge_texts("ActiveMQMapMessage.java") == expand([AMQMAP])


# ---------------------------------------------- PortfolioPublishServlet

def _out(line, meth, arg, el=None):
    return exprstmt(line, inv(line, meth, [arg],
                              qual=nm("out", line), el=el), el=el)


def _escape(line, e):
    return inv(line, "escape", [e])


def _int_tostring(line, argname):
    return _escape(line, inv(line, "toString", [nm(argname, line)],
                             qual=nm("Integer", line)))


PORTFOLIO = method(
    2, 38, ["protected"], "void", "doGet",
    [param(2, "HttpServletRequest", "request"),
     param(2, "HttpServletResponse", "response")],
    [vds(3, "PrintWriter",
         [frag(3, "out", inv(3, "getWriter", qual=nm("response", 3)))]),
     vds(4, "String[]",
         [frag(4, "stocks", inv(4, "getParameterValues",
                                [st("stocks", 4)], qual=nm("request", 4)))]),
     ifstmt(
         5, 7,
         infix(5, infix(5, nm("stocks", 5), "==", null(5)), "||",
               infix(5, qn(5, nm("stocks", 5), "length"), "==",
                     num("0", 5))),
         [_out(6, "println", st(
             "<html><body>No <b>stocks</b> query parameter specified."
             " Cannot publish market data</body></html>", 6))],
         [vds(8, "Integer", [frag(8, "total", cast(
             8, "Integer", inv(
                 8, "getAttribute", [st("total", 8)],
                 qual=inv(8, "getSession", [boolean("true", 8)],
                          qual=nm("request", 8)))))]),
          ifstmt(9, 11, infix(9, nm("total", 9), "==", null(9)),
                 [exprstmt(10, assign(10, nm("total", 10), inv(
                     10, "valueOf", [num("0", 10)],
                     qual=nm("Integer", 10))))]),
          vds(13, "int", [frag(13, "count", inv(
              13, "getNumberOfMessages", [nm("request", 13)]))]),
          exprstmt(14, assign(14, nm("total", 14), inv(
              14, "valueOf",
              [infix(14, inv(14, "intValue", qual=nm("total", 14)),
                     "+", nm("count", 14))],
              qual=nm("Integer", 14)))),
          exprstmt(15, inv(
              15, "setAttribute", [st("total", 15), nm("total", 15)],
              qual=inv(15, "getSession", qual=nm("request", 15)))),
          trystmt(
              17, 33,
              [vds(18, "WebClient", [frag(18, "client", inv(
                  18, "getWebClient", [nm("request", 18)],
                  qual=nm("WebClient", 18)))]),
               forstmt(19, 21,
                       [vde(19, "int", [frag(19, "i", num("0", 19))])],
                       infix(19, nm("i", 19), "<", nm("count", 19)),
                       [postfix(19, nm("i", 19), "++")],
                       [exprstmt(20, inv(20, "sendMessage",
                                         [nm("client", 20),
                                          nm("stocks", 20)]))]),
               _out(22, "print", st(
                   "<html><head><meta http-equiv='refresh' content='",
                   22)),
               vds(23, "String", [frag(23, "refreshRate", inv(
                   23, "getParameter", [st("refresh", 23)],
                   qual=nm("request", 23)))]),
               ifstmt(24, 26, infix(
                   24, infix(24, nm("refreshRate", 24), "==", null(24)),
                   "||",
                   infix(24, inv(24, "length", qual=nm("refreshRate", 24)),
                         "==", num("0", 24))),
                   [exprstmt(25, assign(25, nm("refreshRate", 25),
                                        st("1", 25)))]),
               _out(27, "print", _escape(27, nm("refreshRate", 27))),
               _out(28, "println", st("'/></head>", 28)),
               _out(29, "println", infix(
                   29, st("<body>Published <b>", 29), "+",
                   _int_tostring(29, "count"),
                   [st("</b> of ", 29), _int_tostring(29, "total"),
                    st(" price messages.  Refresh = ", 30),
                    _escape(30, nm("refreshRate", 30)), st("s", 30)],
                   el=30), el=30),
               _out(31, "println", st("</body></html>", 31))],
              [catchstmt(
                  33, 36, "JMSException", "e",
                  [_out(34, "println", infix(
                      34,
                      st("<html><body>Failed sending price messages"
                         " due to <b>", 34),
                      "+", nm("e", 34),
                      [st("</b></body></html>", 34)])),
                   exprstmt(35, inv(
                       35, "log",
                       [infix(35, st("Failed to send message: ", 35),
                              "+", nm("e", 35)),
                        nm("e", 35)]))])])])])


def test_portfolio_ast_matches_reference_trace():
    assert ast_edge_texts("PortfolioPublishServlet.java") == \
        expand([PORTFOLIO])


# ------------------------------------------------- AmqpAdvisoryTest.java

def superinv(line, name, args=()):  # :524 — no parens, no commas
    return N("super." + name + "".join(a.text for a in args),
             line, line, [nm(name, line), *list(args)])


AMQP_SETUP = method(
    38, 42, ["@Override", "public"], "void", "setUp", [],
    [exprstmt(40, assign(40, nm("advisorySupport", 40),
                         boolean("true", 40))),
     exprstmt(41, superinv(41, "setUp"))])


def _conn_assign(line, which):
    return exprstmt(line, assign(
        line, nm(which, line), inv(line, "createAmqpConnection")))


def _assert_eq(line, expect, msgvar):
    return exprstmt(line, inv(
        line, "assertEquals",
        [st(expect, line),
         inv(line, "getStringProperty", [st("ActiveMqDataStructureType",
                                            line)],
             qual=nm(msgvar, line))]))


AMQP_TEST = method(
    44, 69, ["@Test()", "public"], "void", "testConnectionAdvisory", [],
    [_conn_assign(46, "connection1"),
     exprstmt(47, inv(47, "start", qual=nm("connection1", 47))),
     vds(48, "Session", [frag(48, "session1", inv(
         48, "createSession",
         [boolean("false", 48),
          qn(48, nm("Session", 48), "AUTO_ACKNOWLEDGE")],
         qual=nm("connection1", 48)))]),
     vds(49, "Destination", [frag(49, "advisoryTopic", inv(
         49, "createTopic",
         [st("ActiveMQ.Advisory.Consumer.Queue.workshop.queueA", 49)],
         qual=nm("session1", 49)))]),
     vds(50, "MessageConsumer", [frag(50, "advisoryTopicConsumer", inv(
         50, "createConsumer", [nm("advisoryTopic", 50)],
         qual=nm("session1", 50)))]),
     _conn_assign(53, "connection2"),
     exprstmt(54, inv(54, "start", qual=nm("connection2", 54))),
     vds(55, "Session", [frag(55, "session2", inv(
         55, "createSession",
         [boolean("false", 55),
          qn(55, nm("Session", 55), "AUTO_ACKNOWLEDGE")],
         qual=nm("connection2", 55)))]),
     vds(56, "Queue", [frag(56, "queue", inv(
         56, "createQueue", [st("workshop.queueA", 56)],
         qual=nm("session2", 56)))]),
     exprstmt(57, inv(57, "createConsumer", [nm("queue", 57)],
                      qual=nm("session2", 57))),
     vds(59, "Message", [frag(59, "connectMessage", inv(
         59, "receive", [num("100", 59)],
         qual=nm("advisoryTopicConsumer", 59)))]),
     exprstmt(60, inv(60, "assertNotNull", [nm("connectMessage", 60)])),
     _assert_eq(61, "ConsumerInfo", "connectMessage"),
     exprstmt(63, inv(63, "close", qual=nm("connection2", 63))),
     vds(65, "Message", [frag(65, "removeMessage", inv(
         65, "receive", [num("100", 65)],
         qual=nm("advisoryTopicConsumer", 65)))]),
     exprstmt(66, inv(66, "assertNotNull", [nm("removeMessage", 66)])),
     _assert_eq(67, "RemoveInfo", "removeMessage"),
     exprstmt(68, inv(68, "close", qual=nm("connection1", 68)))])

# the Throwable::printStackTrace argument is a method reference: no
# visitor, TWO SimpleNames pushed, PESafeStack.pop -> null, argument
# dropped from children AND text (PESafeStack.java:41-57)
AMQP_CREATE = method(
    71, 77, ["public"], "Connection", "createAmqpConnection", [],
    [vds(72, "JmsConnectionFactory", [frag(72, "factory", cic(
        72, "JmsConnectionFactory", [nm("amqpURI", 72)]))],
        mods=["final"]),
     vds(73, "Connection", [frag(73, "connection", inv(
         73, "createConnection", qual=nm("factory", 73)))],
         mods=["final"]),
     exprstmt(74, inv(74, "setExceptionListener",
                      qual=nm("connection", 74))),
     exprstmt(75, inv(75, "start", qual=nm("connection", 75))),
     ret(76, nm("connection", 76))])


def test_amqp_ast_matches_reference_trace():
    assert ast_edge_texts("AmqpAdvisoryTest.java") == \
        expand([AMQP_SETUP, AMQP_TEST, AMQP_CREATE])
