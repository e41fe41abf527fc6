"""Search-input autocomplete tokenization (ref: packages/app/src/hooks/
useAutoCompleteOptions.tsx:46-175; spec useAutoCompleteOptions.test.tsx).

The search box needs the token UNDER THE CURSOR to decide what to
suggest — quote-aware, but tolerant of the half-typed state an input box
lives in: a ``"`` only OPENS a quoted region when a matching close
exists before the next ``ident:`` field pattern (otherwise
``Field:" Other:"v"`` — three quotes, first unclosed — would collapse
into one token and suggestions would stall). The engine's Lucene parser
remains the authority on the COMPLETE query; this tokenizer serves the
keystroke-time suggestion path."""

from __future__ import annotations

import re
from typing import Optional, Sequence

_IDENT_RE = re.compile(r"[A-Za-z0-9_.]")
_WS = (" ", "\t", "\n")


def derive_map_columns_from_fields(fields) -> list[str]:
    """useAutoCompleteOptions.tsx:46-52 deriveMapColumnsFromFields:
    top-level (path length 1) Map-typed fields' names — the map_columns
    input for facets.merge_path. ``fields``: dicts with ``path`` and
    ``js_type`` (the canonical convertCHDataTypeToJSType value)."""
    return [
        f["path"][0]
        for f in (fields or [])
        if len(f["path"]) == 1 and f.get("js_type") == "map"
    ]


def find_matching_quote(value: str, start_idx: int) -> int:
    """useAutoCompleteOptions.tsx:65-90: index of the quote closing the
    one at *start_idx*, or -1 when the region should be treated as
    unclosed — escaped quotes skip, and whitespace followed by an
    ``ident:`` pattern bails out (the user started a NEW field, so the
    earlier quote never closes)."""
    i = start_idx + 1
    n = len(value)
    while i < n:
        ch = value[i]
        if ch == "\\" and i + 1 < n:
            i += 2
            continue
        if ch == '"':
            return i
        if ch in _WS:
            k = i
            while k < n and value[k] in _WS:
                k += 1
            ident_start = k
            while k < n and _IDENT_RE.match(value[k]):
                k += 1
            if k > ident_start and k < n and value[k] == ":":
                return -1
        i += 1
    return -1


def tokenize_at_cursor(value: str, cursor_pos: int) -> dict:
    """useAutoCompleteOptions.tsx:92-170 tokenizeAtCursor: split on
    single spaces (split-like semantics — consecutive spaces produce
    empty tokens, a trailing space a trailing empty token), keeping
    whitespace inside CLOSED quoted regions; returns ``{token, index,
    tokens}`` for the last token whose [start, start+len] range contains
    the cursor."""
    tokens: list[str] = []
    starts: list[int] = []
    current = ""
    current_start = -1
    in_quotes = False
    escaped = False

    for i, ch in enumerate(value):
        if escaped:
            current += ch
            escaped = False
            continue
        if ch == "\\" and in_quotes:
            current += ch
            escaped = True
            continue
        if ch == '"':
            if in_quotes:
                if current_start == -1:
                    current_start = i
                current += ch
                in_quotes = False
                continue
            if find_matching_quote(value, i) != -1:
                if current_start == -1:
                    current_start = i
                current += ch
                in_quotes = True
                continue
            if current_start == -1:
                current_start = i
            current += ch
            continue
        if not in_quotes and ch == " ":
            tokens.append(current)
            starts.append(i if current_start == -1 else current_start)
            current = ""
            current_start = -1
            continue
        if current_start == -1:
            current_start = i
        current += ch
    tokens.append(current)
    starts.append(len(value) if current_start == -1 else current_start)

    idx = len(tokens) - 1
    for i, tok in enumerate(tokens):
        if cursor_pos <= starts[i] + len(tok):
            idx = i
            break
    return {"token": tokens[idx], "index": idx, "tokens": tokens}
