"""Property-based tests (hypothesis): the kernel must never crash, must
be deterministic, and must uphold the cross-family invariants on ANY
generated program — including malformed ones (PESafeStack-style graceful
degradation, ast/PESafeStack.java:35-60)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from propertygraph_spark.kernel.extract import extract_document

# short lowercase identifiers CAN collide with Java reserved words
# ('do', 'if', 'int', ...) — 'do = do + 0;' is a REAL parse error, not a
# kernel bug (hypothesis found exactly that in r5) — so keywords are
# filtered out of the generator, mirroring what javac's grammar allows
_JAVA_KEYWORDS = frozenset(
    "abstract assert boolean break byte case catch char class const "
    "continue default do double else enum extends final finally float "
    "for goto if implements import instanceof int interface long native "
    "new package private protected public return short static strictfp "
    "super switch synchronized this throw throws transient try void "
    "volatile while var true false null yield record sealed permits".split())
IDENT = st.from_regex(r"[a-z][a-zA-Z0-9]{0,6}", fullmatch=True) \
          .filter(lambda s: s not in _JAVA_KEYWORDS)
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


def test_pii_scrub_fixed_point_and_bounds(spark):
    """One batched check over adversarial strings: scrubbing is a fixed
    point (re-scrubbing the scrubbed text changes nothing — placeholders
    match no pattern), counts are non-negative, and weird unicode never
    crashes the Catalyst regexes."""
    import random
    from propertygraph_spark.ops.text import pii_scrub
    rng = random.Random(99)
    pieces = ["a@b.co", "http://x.y/z?a=1", "12345678", "normal words",
              "é世界", "@@", "...", "a.b@", "https://",
              "\\", '"', "'", "\n", "\t", "9" * 30, "x@y." ,
              "mailto:a.b+c@d-e.org extra"]
    rows = [(i, " ".join(rng.choice(pieces)
                         for _ in range(rng.randrange(0, 12))))
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    first = pii_scrub(docs).collect()
    assert all(r["n_emails"] >= 0 and r["n_urls"] >= 0
               and r["n_long_numbers"] >= 0 for r in first)
    # rebuild docs from scrubbed text via the same transformation chain
    from propertygraph_spark.ops.text import (PII_EMAIL_RE, PII_NUM_RE,
                                              PII_URL_RE)
    import pyspark.sql.functions as F  # noqa: N812
    scrubbed = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
                PII_URL_RE, "<URL>"),
            PII_NUM_RE, "<NUM>").alias("text"))
    second = {r["doc_id"]: r for r in pii_scrub(scrubbed).collect()}
    for r in first:
        s = second[r["doc_id"]]
        assert (s["n_emails"], s["n_urls"], s["n_long_numbers"]) == (0, 0, 0)
        assert s["scrubbed_md5"] == r["scrubbed_md5"]


def test_repetition_and_quality_bounds_on_random_text(spark):
    import random
    from propertygraph_spark.ops.text import repetition_ratio
    rng = random.Random(7)
    rows = [(i, " ".join(rng.choice(["a", "b", "lorem", "x1", ""])
                         for _ in range(rng.randrange(0, 20))))
            for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_ratio(docs).collect()
    assert len(out) == 150
    for r in out:
        assert 0 <= r["repetition_pm"] <= 1000
        assert r["max_repeat"] <= r["n_ngrams"]
