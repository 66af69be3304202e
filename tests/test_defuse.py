"""Def/use rule table (SURVEY.md §2.4; reference ExpressionInfo.java)."""

from conftest import wrap

from propertygraph_spark.kernel.pe import (D_DECLARE_AND_DEF, D_DEF,
                                           D_MAY_DEF, D_NO_DEF,
                                           judge_method_may_def_base)
from propertygraph_spark.kernel.pebuilder import build_methods


def first_stmt(body):
    return build_methods(wrap(body))[0].statements[0]


def defs_of(body):
    st = first_stmt(body)
    build_methods.__wrapped__ if False else None
    return {(d.main, d.typ) for d in st.get_def_variables()}


def method_defs(src):
    m = build_methods(src)[0]
    return {(d.main, d.typ) for d in m.get_def_variables()}


def test_judge_method_heuristics():
    # exact names first (ExpressionInfo.java:156-178)
    assert judge_method_may_def_base("equals") == D_NO_DEF
    assert judge_method_may_def_base("size") == D_NO_DEF
    assert judge_method_may_def_base("push") == D_DEF
    assert judge_method_may_def_base("poll") == D_DEF
    # prefixes
    assert judge_method_may_def_base("getAttribute") == D_NO_DEF
    assert judge_method_may_def_base("debugDump") == D_NO_DEF
    assert judge_method_may_def_base("setAttribute") == D_DEF
    assert judge_method_may_def_base("addAll") == D_DEF
    assert judge_method_may_def_base("putIfAbsent") == D_DEF
    assert judge_method_may_def_base("containsKey") == D_DEF
    # fallthrough
    assert judge_method_may_def_base("frobnicate") == D_MAY_DEF
    assert judge_method_may_def_base("replace") == D_MAY_DEF
    # order matters: 'sizeOf' is a prefix-miss but not the exact name 'size'
    assert judge_method_may_def_base("sizeOf") == D_MAY_DEF


def test_assignment_def():
    m = build_methods(wrap("x = 1;"))[0]
    m.get_def_variables()  # register params into scopes first (PDG.java:251)
    st = m.statements[0]
    assert ("x", D_DEF) in {(d.main, d.typ) for d in st.get_def_variables()}


def test_declare_and_def():
    m = build_methods(wrap("int y = 1;"))[0]
    m.get_def_variables()
    st = m.statements[0]
    assert ("y", D_DECLARE_AND_DEF) in {(d.main, d.typ) for d in st.get_def_variables()}


def test_postfix_prefix_defs():
    m = build_methods(wrap("x++;\n        ++x;\n        boolean b2 = !x;"))[0]
    m.get_def_variables()
    d0 = {(d.main, d.typ) for d in m.statements[0].get_def_variables()}
    d1 = {(d.main, d.typ) for d in m.statements[1].get_def_variables()}
    d2 = {(d.main, d.typ) for d in m.statements[2].get_def_variables()}
    assert ("x", D_DEF) in d0 and ("x", D_DEF) in d1
    assert not any(n == "x" and t >= D_MAY_DEF for n, t in d2)  # !x not a def


def test_array_access_def_ignores_index():
    # retval[1] = v -> defs retval (index irrelevant)
    m = build_methods(wrap("retval[1] = v;"))[0]
    names = {d.main for d in m.statements[0].get_defs_at_least_may_def()}
    assert "this.retval" in names  # undeclared -> field-aliased


def test_chained_receiver_promotion():
    # a.getX().set(1): base not a simple variable; defs inside the qualifier
    # are promoted to >= MAY_DEF (ExpressionInfo.java:348-363)
    m = build_methods(wrap("int a = 0;\n        a.getX().set(1);"))[0]
    m.get_def_variables()
    defs = {(d.main, d.typ) for d in m.statements[1].get_defs_at_least_may_def()}
    assert ("a", D_MAY_DEF) in defs


def test_params_are_not_defs_of_calls():
    m = build_methods(wrap("int a = 0;\n        g(a);"))[0]
    m.get_def_variables()
    defs = m.statements[1].get_defs_at_least_may_def()
    assert not defs


def test_field_access_aliases():
    # this.src = 1 -> def main 'this.src'
    m = build_methods(wrap("this.src = 1;"))[0]
    names = {d.main for d in m.statements[0].get_defs_at_least_may_def()}
    assert "this.src" in names


def test_parameter_declares():
    m = build_methods("class A { void f(int p) { } }")[0]
    defs = {(d.main, d.typ) for d in m.get_def_variables()}
    from propertygraph_spark.kernel.pe import D_DECLARE
    assert ("p", D_DECLARE) in defs


def test_uses_promoted_on_assignment_rhs():
    from propertygraph_spark.kernel.pe import U_USE
    m = build_methods(wrap("int a = 0;\n        x = a;"))[0]
    m.get_def_variables()
    uses = {(u.main, u.typ) for u in m.statements[1].get_use_variables()}
    assert ("a", U_USE) in uses


def test_method_name_not_a_use():
    m = build_methods(wrap("int a = 0;\n        frobnicate(a);"))[0]
    m.get_def_variables()
    uses = {u.main for u in m.statements[1].get_uses_at_least_may_use()}
    assert "frobnicate" not in uses
    assert "a" in uses
