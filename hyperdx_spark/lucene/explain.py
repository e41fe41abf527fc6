"""Natural-language explanation of a search query (autocomplete UX).

Parity target: hyperdxio/hyperdx ``queryParser.ts:205-416``
(EnglishSerializer) + :2175-2201 — the same AST the SQL serializer walks,
rendered as English. Pure function over the parsed AST; no schema needed
(the reference consults metadata only to phrase array fields — we phrase
from the syntax alone)."""

from __future__ import annotations

import re
from dataclasses import replace as _replace

from hyperdx_spark.lucene.ast import BoolOp, Group, MatchAll, Node, Not, Range, Term
from hyperdx_spark.lucene.parser import (
    LuceneSyntaxError,
    decode_special_tokens,
    parse,
)

_CMP_PHRASE = {
    ">": "is greater than",
    ">=": "is greater than or equal to",
    "<": "is less than",
    "<=": "is less than or equal to",
}


def explain_query(query: str, implicit_name: "str | None" = None) -> str:
    """Parse *query* and render the reference's English explanation.

    ``implicit_name`` mirrors ``context.implicitColumnExpression``
    (queryParser.ts:223-227 translateField): None (the
    genEnglishExplanation default) shows implicit terms as 'event' with
    token-search phrasing ('has whole word', ts:349-370); a provided
    expression is shown verbatim with 'contains' phrasing. A query that
    fails to parse degrades to the reference's fallback line
    (ts:2181-2201)."""
    try:
        node = parse(query)
    except (LuceneSyntaxError, RecursionError):
        # only a PARSE failure degrades to the reference's fallback line
        # (ts:2181-2201) — incl. a pathologically nested query blowing the
        # recursive-descent parser; an explain_node bug must surface
        return f"Message containing {query}"
    return explain_node(node, implicit_name)


def _field(term_field, implicit_name: "str | None") -> str:
    return f"'{term_field}'" if term_field else (implicit_name or "event")


def explain_node(node: Node, implicit_name: "str | None" = None) -> str:
    if isinstance(node, MatchAll):
        return "anything"
    if isinstance(node, Term):
        # show 'localhost:3000', not the protected placeholder (our SQL
        # serializer decodes at queryParser.ts:1949 parity; the reference's
        # EnglishSerializer skips this — a cosmetic fix, noted deviation)
        node = _replace(node, value=decode_special_tokens(node.value))
        f = _field(node.field, implicit_name)
        neg = node.negated
        if node.value == "*" and not node.quoted:
            # exists check (queryParser.ts EnglishSerializer existence phrasing)
            return f"{f} {'is null' if neg else 'is not null'}"
        if node.prefix in _CMP_PHRASE:
            phrase = _CMP_PHRASE[node.prefix]
            base = f"{f} {phrase} {node.value}"
            return f"NOT ({base})" if neg else base
        if node.quoted and node.field and not getattr(node, "grouped", False):
            # explicit-field quoted = the eq path (ts:281-296): raw term,
            # no quotes around it
            verb = "is not" if neg else "is"
            return f"{f} {verb} {node.value}"
        if node.quoted and getattr(node, "grouped", False):
            # grouped f:("x y") is a contains search, phrased like the
            # reference's english ('(ServiceName contains "foo bar")')
            verb = "does not contain" if neg else "contains"
            return f'{f} {verb} "{node.value}"'
        # fieldSearch phrasing (ts:338-370): a term with whitespace is
        # shown quoted; implicit terms without a per-context implicit
        # expression are token searches ('has whole word')
        quoted_wilds = node.quoted  # wildcards never fire inside quotes
        prefix_w = (not quoted_wilds) and node.value.startswith("*")
        suffix_w = (
            not quoted_wilds
        ) and node.value.endswith("*") and len(node.value) > 1
        shown = node.value
        if prefix_w:
            shown = shown[1:]
        if suffix_w and shown.endswith("*"):
            shown = shown[:-1]
        if re.search(r"\s", shown.strip()):
            shown = f'"{shown}"'
        if prefix_w and suffix_w:
            verb = "does not contain" if neg else "contains"
        elif suffix_w:
            verb = "does not start with" if neg else "starts with"
        elif prefix_w:
            verb = "does not end with" if neg else "ends with"
        elif not node.field and implicit_name is None:
            verb = "does not have whole word" if neg else "has whole word"
        else:
            verb = "does not contain" if neg else "contains"
        return f"{f} {verb} {shown}"
    if isinstance(node, Range):
        # EnglishSerializer.range (queryParser.ts:396-414): per-BOUND
        # '(exclusive)' suffixes, negation reads 'is not between'
        f = _field(node.field, implicit_name)
        lo = "-infinity" if node.low == "*" else node.low
        hi = "infinity" if node.high == "*" else node.high
        lo_b = lo if node.include_low else f"{lo} (exclusive)"
        hi_b = hi if node.include_high else f"{hi} (exclusive)"
        verb = "is not" if node.negated else "is"
        return f"{f} {verb} between {lo_b} and {hi_b}"
    if isinstance(node, BoolOp):
        return (
            f"{explain_node(node.left, implicit_name)} {node.op} "
            f"{explain_node(node.right, implicit_name)}"
        )
    if isinstance(node, Not):
        # negated leaves read as natural phrases ('does not contain', 'is
        # null') rather than a wrapping NOT(...)
        child = node.child
        if isinstance(child, (Term, Range)):
            from dataclasses import replace

            return explain_node(replace(child, negated=True), implicit_name)
        return f"NOT ({explain_node(child, implicit_name)})"
    if isinstance(node, Group):
        if node.field is not None:
            # push the field into inner terms (grouped flag set) so the
            # quoted-contains phrasing matches the SQL dispatch
            from hyperdx_spark.lucene.serializer import _push_field

            inner = explain_node(
                _push_field(node.child, node.field), implicit_name
            )
            return f"NOT ({inner})" if node.negated else f"({inner})"
        inner_name = f"'{node.field}'" if node.field else implicit_name
        inner = explain_node(node.child, inner_name)
        body = f"({inner})"
        return f"NOT {body}" if node.negated else body
    raise TypeError(f"unknown node {node!r}")
