"""Property-based tests (hypothesis): the kernel must never crash, must
be deterministic, and must uphold the cross-family invariants on ANY
generated program — including malformed ones (PESafeStack-style graceful
degradation, ast/PESafeStack.java:35-60)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from propertygraph_spark.kernel.extract import extract_document

IDENT = st.from_regex(r"[a-z][a-zA-Z0-9]{0,6}", fullmatch=True)
NUM = st.integers(min_value=0, max_value=10**9)


@st.composite
def statement(draw, depth=0):
    kind = draw(st.sampled_from(
        ["assign", "decl", "call", "return", "if", "ifelse", "while",
         "for", "try", "break_in_loop", "ternary", "postfix"]
        if depth < 2 else ["assign", "decl", "call", "return", "postfix"]))
    v = draw(IDENT)
    n = draw(NUM)
    if kind == "assign":
        return f"{v} = {v} + {n};"
    if kind == "decl":
        return f"int {v} = {n};"
    if kind == "call":
        recv = draw(IDENT)
        return f"{recv}.{draw(st.sampled_from(['get', 'set', 'put', 'size', 'foo']))}({v});"
    if kind == "return":
        return f"return {v};"
    if kind == "postfix":
        return f"{v}++;"
    if kind == "ternary":
        return f"{v} = {v} > {n} ? {v} : -{v};"
    inner = " ".join(draw(st.lists(statement(depth=depth + 1),  # type: ignore
                                   min_size=1, max_size=3)))
    if kind == "if":
        return f"if ({v} > {n}) {{ {inner} }}"
    if kind == "ifelse":
        return f"if ({v} > {n}) {{ {inner} }} else {{ {v} = {n}; }}"
    if kind == "while":
        return f"while ({v} < {n}) {{ {inner} }}"
    if kind == "for":
        return f"for (int i = 0; i < {n}; i++) {{ {inner} }}"
    if kind == "try":
        return f"try {{ {inner} }} catch (Exception e) {{ {v} = 0; }}"
    if kind == "break_in_loop":
        return f"while (true) {{ if ({v} > {n}) {{ break; }} {inner} }}"
    raise AssertionError(kind)


@st.composite
def java_program(draw):
    stmts = draw(st.lists(statement(), min_size=1, max_size=6))
    body = "\n        ".join(stmts)
    return ("class Gen {\n    public int run(int a, int b) {\n        "
            + body + "\n        return a;\n    }\n}")


@given(java_program())
@settings(max_examples=60, deadline=None)
def test_generated_programs_extract_cleanly(src):
    nodes, triples, mentions, err = extract_document("gen", src)
    assert err is None, (err, src)
    ids = {n["node_id"] for n in nodes}
    cfg = set()
    exe = set()
    for t in triples:
        assert t["subj"] in ids and t["obj"] in ids
        if t["pred"].startswith("cfg_"):
            cfg.add((t["method_id"], t["subj"], t["obj"]))
        elif t["pred"] == "pdg_execution":
            exe.add((t["method_id"], t["subj"], t["obj"]))
        if t["pred"] == "pdg_data":
            assert t["label"]
    assert cfg <= exe  # execution dependence mirrors CFG topology


@given(java_program())
@settings(max_examples=20, deadline=None)
def test_generated_programs_deterministic(src):
    assert extract_document("d", src) == extract_document("d", src)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=400))
@settings(max_examples=80, deadline=None)
def test_arbitrary_garbage_never_crashes(src):
    nodes, triples, mentions, err = extract_document("junk", src)
    # any outcome is fine except an exception escaping the kernel
    assert isinstance(nodes, list) and isinstance(triples, list)


@given(st.lists(st.sampled_from(
    ["class A {", "}", "void m() {", "int x = 1;", "if (x) {",
     "} else {", "while (x) {", "return;", "try {", "} catch (E e) {",
     "(", ")", "{", ";", "x++;"]), min_size=1, max_size=30))
@settings(max_examples=80, deadline=None)
def test_token_soup_never_crashes(pieces):
    src = "\n".join(pieces)
    nodes, triples, mentions, err = extract_document("soup", src)
    assert isinstance(triples, list)


# ------------------------------------------------ unicode-escape translation

from propertygraph_spark.kernel.lexer import LexError, translate_unicode_escapes


@given(st.text(alphabet=st.characters(blacklist_characters="\\"),
               max_size=200))
def test_unicode_translate_identity_without_backslash(s):
    assert translate_unicode_escapes(s) is s or \
        translate_unicode_escapes(s) == s


@given(st.integers(min_value=0x20, max_value=0xFFFF),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=3))
def test_unicode_translate_escape_forms(cp, n_us, n_bs_pairs):
    """backslash(2k) + backslash + u{1..3} + 4hex decodes to chr(cp)
    preceded by k literal backslashes (JLS even-backslash rule)."""
    esc = "\\" * (2 * n_bs_pairs) + "\\" + "u" * n_us + f"{cp:04x}"
    out = translate_unicode_escapes("A" + esc + "B")
    assert out == "A" + "\\" * (2 * n_bs_pairs) + chr(cp) + "B"


@given(st.text(alphabet="\\uZ01abq", max_size=24))
def test_unicode_translate_never_crashes_or_hangs(s):
    """Arbitrary backslash/u soup: either translates or raises LexError —
    never another exception, and the fast path stays consistent."""
    try:
        out = translate_unicode_escapes(s)
    except LexError:
        return
    assert isinstance(out, str)
