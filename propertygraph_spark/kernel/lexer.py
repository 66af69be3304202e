"""Java tokenizer for the extraction kernel.

Produces a flat token stream with source offsets; comments and whitespace
are skipped but offsets are preserved so line numbers match the raw source
(the reference computes every line number from the original compilation
unit, /root/reference .../ast/PEASTVisitor.java:117-119).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import List, NamedTuple

KEYWORDS = frozenset(
    """abstract assert boolean break byte case catch char class const continue
    default do double else enum extends final finally float for goto if
    implements import instanceof int interface long native new package private
    protected public return short static strictfp super switch synchronized
    this throw throws transient try void volatile while record yield
    non-sealed sealed permits var""".split()
)

# Longest-match-first operator table.
OPERATORS = [
    ">>>=", "<<=", ">>=", ">>>", "...", "->", "::",
    "==", "!=", "<=", ">=", "&&", "||", "++", "--", "+=", "-=", "*=", "/=",
    "%=", "&=", "|=", "^=", "<<", ">>",
    "+", "-", "*", "/", "%", "=", "<", ">", "!", "~", "&", "|", "^", "?",
    ":", ";", ",", ".", "(", ")", "{", "}", "[", "]", "@",
]
_OP_BY_FIRST = {}
for _op in OPERATORS:
    _OP_BY_FIRST.setdefault(_op[0], []).append(_op)


class Token(NamedTuple):
    kind: str  # 'ident' | 'keyword' | 'number' | 'string' | 'char' | 'op' | 'eof'
    value: str  # raw source slice for literals; text for ident/op
    start: int  # offset of first char
    end: int  # offset AFTER last char


class LexError(ValueError):
    pass


class LineMap:
    """Offset -> 1-based line number, with JDT semantics: a line delimiter
    belongs to the line it terminates."""

    def __init__(self, source: str):
        starts = [0]
        i = 0
        n = len(source)
        while i < n:
            c = source[i]
            if c == "\n":
                starts.append(i + 1)
            elif c == "\r":
                if i + 1 < n and source[i + 1] == "\n":
                    i += 1
                starts.append(i + 1)
            i += 1
        self._starts = starts

    def line_of(self, offset: int) -> int:
        if offset < 0:
            offset = 0
        return bisect_right(self._starts, offset)


def translate_unicode_escapes(source: str) -> str:
    """JLS §3.3 unicode-escape translation, applied to the RAW input
    before tokenizing (JDT's scanner decodes ``\\uXXXX`` anywhere — in
    identifiers, keywords, operators, even as a literal-terminating
    quote — not only inside literals). An escape is a backslash preceded
    by an EVEN number of backslashes, one or more ``u``s, then exactly 4
    hex digits; an odd backslash followed by ``u`` that is not a valid
    escape is a compile error (here: LexError, which the kernel degrades
    to an error row). No-op fast path when the source has no ``\\u``."""
    if "\\u" not in source:
        return source
    out = []
    i = 0
    n = len(source)
    hexdigits = "0123456789abcdefABCDEF"
    while i < n:
        c = source[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        j = i
        while j < n and source[j] == "\\":
            j += 1
        n_bs = j - i
        if n_bs % 2 == 1 and j < n and source[j] == "u":
            out.append("\\" * (n_bs - 1))
            k = j
            while k < n and source[k] == "u":
                k += 1
            hex4 = source[k:k + 4]
            if len(hex4) == 4 and all(h in hexdigits for h in hex4):
                out.append(chr(int(hex4, 16)))
                i = k + 4
                continue
            raise LexError(f"invalid unicode escape at offset {i}")
        out.append(source[i:j])
        i = j
    return "".join(out)


def unescape_java(body: str) -> str:
    """Resolve Java string/char escapes (JDT getLiteralValue semantics)."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            out.append("\\")
            break
        e = body[i]
        simple = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                  "'": "'", '"': '"', "\\": "\\", "s": " ", "0": "\0"}
        if e in simple and not (e == "0" and i + 1 < n and body[i + 1].isdigit()):
            out.append(simple[e])
            i += 1
        elif e == "u":
            j = i + 1
            while j < n and body[j] == "u":
                j += 1
            hex_part = body[j:j + 4]
            out.append(chr(int(hex_part, 16)))
            i = j + 4
        elif e.isdigit():  # octal escape, up to 3 digits
            j = i
            while j < n and j < i + 3 and body[j] in "01234567":
                j += 1
            out.append(chr(int(body[i:j], 8)))
            i = j
        else:
            out.append(e)
            i += 1
    return "".join(out)


import re

# Master token pattern: one compiled scan instead of a char-by-char
# Python loop (the lexer is on the kernel's critical path). Number/string
# sub-patterns replicate the historical loop's acceptance rules; the rare
# cases the regex cannot express (unterminated literals) are detected by
# a gap in the match stream and raise the same LexError.
_NUMBER_RE = (
    r"0[xX][0-9a-fA-F_]+[lL]?"
    r"|0[bB][01_]+[lL]?"
    r"|(?:\d[\d_]*(?:\.(?=[0-9eEfFdD])[\d_]*)?|\.\d[\d_]*)"
    r"(?:[eE](?=[0-9+\-])[+-]?[\d_]*)?[lLfFdD]?"
)
_KW_ALT = "|".join(sorted((k for k in KEYWORDS if "-" not in k),
                          key=len, reverse=True))
_MASTER = re.compile(
    r"(?P<ws>[ \t\r\n\f\x0b]+)"
    r"|(?P<linec>//[^\n]*)"
    r"|(?P<blockc>/\*(?s:.*?)\*/)"
    rf"|(?P<keyword>(?:{_KW_ALT})(?![A-Za-z0-9_$]))"
    r"|(?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)"
    rf"|(?P<number>{_NUMBER_RE})"
    r'|(?P<tblock>"""(?s:.*?)""")'
    r'|(?P<string>"(?:[^"\\\n]|\\.)*")'
    r"|(?P<char>'(?:[^'\\]|\\.)*?')"
    r"|(?P<op>" + "|".join(re.escape(op) for op in OPERATORS) + r")"
)


def tokenize(source: str) -> List[Token]:
    toks: List[Token] = []
    append = toks.append
    i = 0
    n = len(source)
    for m in _MASTER.finditer(source):
        if m.start() != i:
            c = source[i]
            if c == '"':
                raise LexError(f"unterminated string at {i}")
            if c == "'":
                raise LexError(f"unterminated char literal at {i}")
            if source.startswith("/*", i):
                raise LexError(f"unterminated block comment at {i}")
            raise LexError(f"unexpected character {c!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws" or kind == "linec" or kind == "blockc":
            continue
        v = m.group()
        if kind == "tblock":
            append(Token("string", v, m.start(), i))
        else:
            append(Token(kind, v, m.start(), i))
    if i != n:
        c = source[i]
        if c == '"':
            raise LexError(f"unterminated string at {i}")
        if c == "'":
            raise LexError(f"unterminated char literal at {i}")
        if source.startswith("/*", i):
            raise LexError(f"unterminated block comment at {i}")
        raise LexError(f"unexpected character {c!r} at offset {i}")
    append(Token("eof", "", n, n))
    return toks
