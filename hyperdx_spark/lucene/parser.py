"""Hand-written recursive-descent parser for the Lucene search dialect.

Grammar (mirrors @hyperdx/lucene as used by the reference,
``queryParser.ts:50-52, 435-454, 1937-2060``):

    query   := or
    or      := and (('OR' | '||') and)*
    and     := unary (('AND' | '&&')? unary)*      # implicit operator = AND
    unary   := ('NOT' | '-' | '!') unary | primary
    primary := '(' or ')'
             | field ':' value
             | value
    value   := '"..."' | '[a TO b]' | '{a TO b}' | ('>='|'<='|'>'|'<')? word
             | '(' or ')'                           # grouped, inherits field

Special-token handling mirrors the reference's ``encodeSpecialTokens`` /
``decodeSpecialTokens`` pair (queryParser.ts:32-48): before tokenizing,
``\\\\``, ``http://`` / ``https://`` scheme colons, ``localhost:<port>``
and escaped ``\\:`` are rewritten into protected placeholder tokens so the
field-split never fires on them; the serializer decodes term text back at
dispatch time (queryParser.ts:1949). A ``//``-lookahead additionally keeps
other URL-shaped words whole.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from hyperdx_spark.lucene.ast import BoolOp, Group, MatchAll, Node, Not, Range, Term

_FIELD_RE = re.compile(r"[A-Za-z_@#][\w.@#\-]*")
_CMP_PREFIXES = (">=", "<=", ">", "<")

# --- special-token encode/decode (queryParser.ts:32-48, verbatim order) ---
_LOCALHOST_ENC_RE = re.compile(r"localhost:(\d{1,5})")
_LOCALHOST_DEC_RE = re.compile(r"localhost_COLON_(\d{1,5})")


def encode_special_tokens(query: str) -> str:
    """Protect colon-bearing literals from the field-split pass.

    Mirrors ``encodeSpecialTokens`` (queryParser.ts:32-38): literal ``\\\\``,
    URL scheme colons, ``localhost:<1-5 digit port>`` and escaped ``\\:``
    become placeholder tokens that contain no separator characters.
    """
    query = query.replace("\\\\", "HDX_BACKSLASH_LITERAL")
    query = query.replace("http://", "http_COLON_//")
    query = query.replace("https://", "https_COLON_//")
    query = _LOCALHOST_ENC_RE.sub(r"localhost_COLON_\1", query)
    query = query.replace("\\:", "HDX_COLON")
    return query


def decode_special_tokens(text: str) -> str:
    """Restore placeholder tokens inside a term value
    (``decodeSpecialTokens``, queryParser.ts:40-48, same replacement order;
    the ``\\"`` step is handled by the quote tokenizer here)."""
    text = text.replace('\\"', '"')
    text = text.replace("HDX_BACKSLASH_LITERAL", "\\")
    text = text.replace("http_COLON_//", "http://")
    text = text.replace("https_COLON_//", "https://")
    text = _LOCALHOST_DEC_RE.sub(r"localhost:\1", text)
    text = text.replace("HDX_COLON", ":")
    return text


@dataclass
class _Tok:
    kind: str  # LPAREN RPAREN WORD QUOTED RANGE NEG AND OR NOT FIELD
    text: str = ""
    include_low: bool = True
    include_high: bool = True


class LuceneSyntaxError(ValueError):
    pass


def _tokenize(q: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("LPAREN"))
            i += 1
            continue
        if c == ")":
            toks.append(_Tok("RPAREN"))
            i += 1
            continue
        if c in "-!" and (not toks or toks[-1].kind in ("LPAREN", "AND", "OR", "NOT", "NEG", "FIELD")) \
                and i + 1 < n and not q[i + 1].isspace():
            # negation only in operator position; 'field:-5' stays literal
            toks.append(_Tok("NEG"))
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            if j >= n:
                raise LuceneSyntaxError("unterminated quote")
            toks.append(_Tok("QUOTED", "".join(buf)))
            i = j + 1
            continue
        if c in "[{":
            close = {"[": "]", "{": "}"}
            # ranges may mix brackets: [a TO b}
            j = i + 1
            while j < n and q[j] not in "]}":
                j += 1
            if j >= n:
                raise LuceneSyntaxError("unterminated range")
            toks.append(
                _Tok(
                    "RANGE",
                    q[i + 1 : j],
                    include_low=(c == "["),
                    include_high=(q[j] == "]"),
                )
            )
            i = j + 1
            continue
        # word: read until whitespace / paren / range-open; honor backslash escapes
        j = i
        buf = []
        while j < n and not q[j].isspace() and q[j] not in '()[{"':
            if q[j] == "\\" and j + 1 < n:
                buf.append("\\" + q[j + 1])
                j += 2
            else:
                buf.append(q[j])
                j += 1
        word = "".join(buf)
        i = j
        if word in ("AND", "&&"):
            toks.append(_Tok("AND"))
            continue
        if word in ("OR", "||"):
            toks.append(_Tok("OR"))
            continue
        if word == "NOT":
            toks.append(_Tok("NOT"))
            continue
        # field prefix? split at first ':' when the prefix is field-like and
        # the rest isn't a URL scheme remainder ('//...')
        if word.endswith(":") and _FIELD_RE.fullmatch(word[:-1]):
            toks.append(_Tok("FIELD", word[:-1]))
            continue
        m = word.find(":")
        if m > 0 and _FIELD_RE.fullmatch(word[:m]) and not word[m + 1 : m + 3] == "//":
            toks.append(_Tok("FIELD", word[:m]))
            rest = word[m + 1 :]
            if rest:
                toks.append(_Tok("WORD", rest))
            continue
        toks.append(_Tok("WORD", word))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> Optional[_Tok]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    def parse_or(self) -> Node:
        left = self.parse_and()
        while (t := self.peek()) and t.kind == "OR":
            self.next()
            left = BoolOp("OR", left, self.parse_and())
        return left

    def parse_and(self) -> Node:
        left = self.parse_unary()
        while (t := self.peek()) and t.kind not in ("OR", "RPAREN"):
            if t.kind == "AND":
                self.next()
            left = BoolOp("AND", left, self.parse_unary())
        return left

    def parse_unary(self) -> Node:
        t = self.peek()
        if t is None:
            raise LuceneSyntaxError("unexpected end of query")
        if t.kind in ("NEG", "NOT"):
            self.next()
            return Not(self.parse_unary())
        return self.parse_primary()

    def parse_primary(self, field: Optional[str] = None) -> Node:
        t = self.peek()
        if t is None:
            raise LuceneSyntaxError("unexpected end of query")
        if t.kind == "LPAREN":
            self.next()
            inner = self.parse_or()
            if not (self.peek() and self.peek().kind == "RPAREN"):
                raise LuceneSyntaxError("missing )")
            self.next()
            return Group(inner, field=field)
        if t.kind == "FIELD":
            self.next()
            return self.parse_primary(field=t.text)
        if t.kind == "QUOTED":
            self.next()
            return Term(t.text, field=field, quoted=True)
        if t.kind == "RANGE":
            self.next()
            m = re.fullmatch(r"\s*(\S+)\s+TO\s+(\S+)\s*", t.text)
            if not m:
                raise LuceneSyntaxError(f"bad range: {t.text!r}")
            return Range(
                field,
                m.group(1),
                m.group(2),
                include_low=t.include_low,
                include_high=t.include_high,
            )
        if t.kind == "WORD":
            self.next()
            word = t.text
            for p in _CMP_PREFIXES:
                if word.startswith(p) and len(word) > len(p):
                    return Term(word[len(p):], field=field, prefix=p)
            return Term(word, field=field)
        raise LuceneSyntaxError(f"unexpected token {t.kind}")


def parse(query: str) -> Node:
    query = (query or "").strip()
    if not query:
        return MatchAll()
    # encode BEFORE tokenizing (queryParser.ts:51) so 'localhost:3000' and
    # friends never reach the field-split branch; term values are decoded
    # back by the serializer at dispatch time.
    toks = _tokenize(encode_special_tokens(query))
    if not toks:
        return MatchAll()
    p = _Parser(toks)
    node = p.parse_or()
    if p.peek() is not None:
        raise LuceneSyntaxError(f"trailing tokens at {p.pos}")
    return node
