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


def tokenize(source: str) -> List[Token]:
    toks: List[Token] = []
    i = 0
    n = len(source)
    while i < n:
        c = source[i]
        if c in " \t\r\n\f\x0b":
            i += 1
            continue
        if c == "/" and i + 1 < n:
            c2 = source[i + 1]
            if c2 == "/":
                j = source.find("\n", i)
                i = n if j < 0 else j + 1
                continue
            if c2 == "*":
                j = source.find("*/", i + 2)
                if j < 0:
                    raise LexError(f"unterminated block comment at {i}")
                i = j + 2
                continue
        if c.isalpha() or c in "_$":
            j = i + 1
            while j < n and (source[j].isalnum() or source[j] in "_$"):
                j += 1
            word = source[i:j]
            toks.append(Token("keyword" if word in KEYWORDS else "ident", word, i, j))
            i = j
            continue
        if c.isdigit() or (c == "." and i + 1 < n and source[i + 1].isdigit()):
            j = i
            if c == "0" and i + 1 < n and source[i + 1] in "xX":
                j = i + 2
                while j < n and (source[j] in "0123456789abcdefABCDEF_"):
                    j += 1
                if j < n and source[j] in "lL":
                    j += 1
            elif c == "0" and i + 1 < n and source[i + 1] in "bB":
                j = i + 2
                while j < n and source[j] in "01_":
                    j += 1
                if j < n and source[j] in "lL":
                    j += 1
            else:
                seen_dot = seen_exp = False
                while j < n:
                    ch = source[j]
                    if ch.isdigit() or ch == "_":
                        j += 1
                    elif ch == "." and not seen_dot and not seen_exp \
                            and j + 1 < n and (source[j + 1].isdigit() or source[j + 1] in "eEfFdD"):
                        seen_dot = True
                        j += 1
                    elif ch in "eE" and not seen_exp and j + 1 < n \
                            and (source[j + 1].isdigit() or source[j + 1] in "+-"):
                        seen_exp = True
                        j += 2 if source[j + 1] in "+-" else 1
                    else:
                        break
                if j < n and source[j] in "lLfFdD":
                    j += 1
            toks.append(Token("number", source[i:j], i, j))
            i = j
            continue
        if c == '"':
            if source.startswith('"""', i):  # text block
                j = source.find('"""', i + 3)
                if j < 0:
                    raise LexError(f"unterminated text block at {i}")
                toks.append(Token("string", source[i:j + 3], i, j + 3))
                i = j + 3
                continue
            j = i + 1
            while j < n:
                if source[j] == "\\":
                    j += 2
                    continue
                if source[j] == '"':
                    break
                if source[j] == "\n":
                    raise LexError(f"unterminated string at {i}")
                j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("string", source[i:j + 1], i, j + 1))
            i = j + 1
            continue
        if c == "'":
            j = i + 1
            while j < n:
                if source[j] == "\\":
                    j += 2
                    continue
                if source[j] == "'":
                    break
                j += 1
            if j >= n:
                raise LexError(f"unterminated char literal at {i}")
            toks.append(Token("char", source[i:j + 1], i, j + 1))
            i = j + 1
            continue
        for op in _OP_BY_FIRST.get(c, ()):
            if source.startswith(op, i):
                toks.append(Token("op", op, i, i + len(op)))
                i += len(op)
                break
        else:
            raise LexError(f"unexpected character {c!r} at offset {i}")
    toks.append(Token("eof", "", n, n))
    return toks
