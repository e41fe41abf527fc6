"""Schema-aware Lucene AST -> Spark SQL predicate serializer.

Ref: hyperdxio/hyperdx ``packages/common-utils/src/queryParser.ts`` —
``CustomSchemaSQLSerializerV2`` (eq 418-544, exists 546-588, cmp/range
590-696/726-783, array fields 821-908, LIKE/token dispatch 1460-1608, field
resolution 1620-1760, implicit column 1873-1911, term dispatch 1937-2033).

Semantics preserved:
* unquoted term on a string field  -> case-insensitive substring (ILIKE %v%)
* quoted term on an explicit field -> exact equality; via grouped syntax
                                      f:("...") or on the implicit column
                                      it stays a contains / token search
                                      (ts:1962-1966 isImplicitField guard)
* wildcards                        -> ONE leading/trailing '*' anchors the
                                      LIKE (starts-with / ends-with);
                                      inner '*' is a literal character
                                      (queryParser.ts:1996-2005, 54-56)
* bare term (no field)             -> token search on the implicit column
                                      (word-boundary), plus whole-term
                                      substring when the term has separators
* field:*                          -> exists (notEmpty)
* >=,<=,>,<  and [a TO b] / {a TO b} ranges, '*' = unbounded end
* Map['k'] / JSON missing keys read as '' (ClickHouse default-value
  semantics) so negations keep rows where the key is absent.

Output is a Spark SQL boolean expression string — deterministic and
snapshot-testable, exactly like the reference's SQL-snapshot strategy
(SURVEY.md §5); wrap with ``F.expr`` for the DataFrame API.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    MapType,
    NumericType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from hyperdx_spark.lucene.ast import BoolOp, Group, MatchAll, Node, Not, Range, Term
from hyperdx_spark.lucene.parser import decode_special_tokens, parse

# Needle tokenizer — the reference's tokenizeTerm regex verbatim
# (queryParser.ts:709-715): ASCII separator ranges only, so non-ASCII
# characters stay INSIDE tokens ('café' is one token, not 'caf').
_NEEDLE_SPLIT_RE = r"[ -/:-@\[-`{-~\t\n\r]+"
# Haystack tokenizer — ClickHouse HasTokenImpl::isTokenSeparator (any
# ASCII byte that is not alphanumeric; the function the reference's
# hasToken(lower(col), token) calls into). Java's \p{Punct}+\p{Space}+
# \p{Cntrl} is exactly 0x00-0x2F,0x3A-0x40,0x5B-0x60,0x7B-0x7F. Doubled
# backslashes survive the Spark SQL string literal.
_HAYSTACK_SPLIT_SQL = "[\\\\p{Punct}\\\\p{Space}\\\\p{Cntrl}]+"
_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _unescape(v: str) -> str:
    return re.sub(r"\\(.)", r"\1", v)


def _sql_str(v: str) -> str:
    """Single-quoted SQL string literal."""
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _like_escape(v: str) -> str:
    return v.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")


def _wildcard_to_like(v: str) -> str:
    """Edge wildcards -> LIKE pattern. The reference strips ONE leading
    and ONE trailing '*' (queryParser.ts:1996-2005) and its
    escapeLikePattern leaves '*' untouched (ts:54-56) — so INNER
    asterisks are literal characters ('e*r' matches the 3-char string),
    never wildcards. Deviation kept deliberately: edge wildcards are
    honored on explicit fields too (anchored LIKE), where the reference's
    fieldSearch ignores the flags and falls back to substring — honoring
    what the user typed beats silently widening it."""
    prefix = v.startswith("*")
    core = v[1:] if prefix else v
    suffix = core.endswith("*")
    core = core[:-1] if suffix else core
    return ("%" if prefix else "") + _like_escape(core) + ("%" if suffix else "")


def _has_edge_wildcard(v: str) -> bool:
    return len(v) > 1 and (v.startswith("*") or v.endswith("*"))


def _is_number(v: str) -> bool:
    return bool(_NUM_RE.fullmatch(v))


def _ts_lit(v: str) -> str:
    """Timestamp literal for a date-typed field. The reference searches
    Date columns as NUMBERS (convertCHTypeToLuceneSearchType,
    clickhouse/index.ts:139-146: Date -> Number), and CH compares
    DateTime to a number as epoch seconds — so a numeric term becomes
    timestamp_seconds(v) (constant-folded, still pushdown-eligible);
    a datetime string keeps the CAST."""
    if _is_number(v):
        return f"timestamp_seconds({v})"
    return f"CAST({_sql_str(v)} AS TIMESTAMP)"


def _num_lit(v: str) -> str:
    return v  # validated by _is_number


class _Field:
    """A resolved field: a SQL expression + search kind."""

    def __init__(
        self,
        expr: str,
        kind: str,
        unknown: bool = False,
        elem_kind: "Optional[str]" = None,
        sub: "Optional[str]" = None,
    ):
        self.expr = expr
        self.kind = kind  # 'string' | 'number' | 'bool' | 'date' | 'json' | 'array' | 'map' | 'expr'
        # for kind == 'array': the element search kind (drives the exact
        # numeric/boolean membership dispatch, queryParser.ts:252-257
        # extractInnerCHArrayJSType)
        self.elem_kind = elem_kind
        # for kind == 'array' with a dotted postfix (array-of-maps /
        # array-of-JSON, queryParser.ts:305-392): the key path applied to
        # each ELEMENT inside the arrayExists lambda
        self.sub = sub
        # True only when resolution fell through every schema / source /
        # materialized lookup — i.e. a plain identifier that names nothing
        self.unknown = unknown

    def elem_expr(self) -> str:
        """The per-element accessor inside an exists() lambda."""
        if self.sub is None:
            return "x"
        if self.elem_kind == "map":
            # single dotted key, like the reference's el['message.subkey']
            return f"element_at(x, {_sql_str(self.sub)})"
        if self.elem_kind == "struct":
            return "x" + "".join(f".`{p}`" for p in self.sub.split("."))
        # array of JSON strings
        return f"get_json_object(x, {_sql_str('$.' + self.sub)})"


class SearchQueryBuilder:
    """Compile Lucene queries against one table schema + source mapping."""

    def __init__(self, schema: StructType, source=None):
        self.schema = schema
        self.source = source
        self._fields = {f.name: f.dataType for f in schema.fields}
        self._fields_lower = {f.name.lower(): f.name for f in schema.fields}

    # ---------- public API ----------

    def build(self, query) -> str:
        node = parse(query) if isinstance(query, str) else query
        sql = self._node(node)
        return sql if sql else "TRUE"

    # ---------- field resolution (queryParser.ts:1620-1760) ----------

    def _kind_of(self, dt: DataType) -> str:
        if isinstance(dt, StringType):
            return "string"
        if isinstance(dt, BooleanType):
            return "bool"
        if isinstance(dt, NumericType):
            return "number"
        if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            return "date"
        if isinstance(dt, MapType):
            return "map"
        if isinstance(dt, ArrayType):
            return "array"
        if isinstance(dt, StructType):
            return "struct"
        return "expr"

    def resolve(self, field: str) -> _Field:
        src = self.source
        if src is not None and field in ("level", "severity") and getattr(
            src, "severity_text_expression", None
        ):
            return _Field(src.severity_text_expression, "string")
        # exact match (then case-insensitive)
        name = field if field in self._fields else self._fields_lower.get(field.lower())
        if name is not None:
            dt = self._fields[name]
            elem = (
                self._kind_of(dt.elementType)
                if isinstance(dt, ArrayType)
                else None
            )
            return _Field(f"`{name}`", self._kind_of(dt), elem_kind=elem)
        # longest-prefix match over dot-path (queryParser.ts:126-155)
        parts = field.split(".")
        for cut in range(len(parts) - 1, 0, -1):
            prefix = ".".join(parts[:cut])
            name = prefix if prefix in self._fields else self._fields_lower.get(prefix.lower())
            if name is None:
                continue
            rest = parts[cut:]
            dt = self._fields[name]
            # materialized-column substitution (fastifySQL analogue): a
            # pre-extracted physical column replaces the map probe / JSON
            # parse, restoring parquet stats pruning on the accessor
            mfields = getattr(src, "materialized_fields", None) if src else None
            if mfields:
                from hyperdx_spark.functions.materialize import lookup

                mat = lookup(mfields, name, ".".join(rest))
                if mat is not None:
                    mname = (
                        mat if mat in self._fields
                        else self._fields_lower.get(mat.lower())
                    )
                    if mname is not None:
                        return _Field(f"`{mname}`", self._kind_of(self._fields[mname]))
                    return _Field(f"`{mat}`", "string")
            if isinstance(dt, MapType):
                # Map['k'] with ClickHouse missing-key default ''
                return _Field(
                    f"coalesce(element_at(`{name}`, {_sql_str('.'.join(rest))}), '')",
                    "string",
                )
            if isinstance(dt, StructType):
                expr = f"`{name}`" + "".join(f".`{p}`" for p in rest)
                leaf: DataType = dt
                ok = True
                for p in rest:
                    if isinstance(leaf, StructType) and p in leaf.fieldNames():
                        leaf = leaf[p].dataType
                    else:
                        ok = False
                        break
                return _Field(expr, self._kind_of(leaf) if ok else "string")
            if isinstance(dt, StringType):
                # JSON-in-string: JSONExtractString analogue (queryParser.ts:1727-1739)
                path = "$." + ".".join(rest)
                return _Field(
                    f"coalesce(get_json_object(`{name}`, {_sql_str(path)}), '')",
                    "json",
                )
            if isinstance(dt, ArrayType):
                # array-of-maps / array-of-structs / array-of-JSON with a
                # key postfix: the key applies per ELEMENT inside the
                # arrayExists lambda (queryParser.ts:305-392)
                et = dt.elementType
                sub = ".".join(rest)
                if isinstance(et, MapType):
                    return _Field(f"`{name}`", "array", elem_kind="map", sub=sub)
                if isinstance(et, StructType):
                    return _Field(
                        f"`{name}`", "array", elem_kind="struct", sub=sub
                    )
                if isinstance(et, StringType):
                    return _Field(f"`{name}`", "array", elem_kind="json", sub=sub)
                return _Field(
                    f"`{name}`", "array", elem_kind=self._kind_of(et)
                )
        # unknown: pass through as a raw expression (queryParser.ts:1752-1759)
        return _Field(field, "expr", unknown=True)

    def _implicit_exprs(self) -> list[str]:
        src = self.source
        exprs = None
        if src is not None:
            exprs = getattr(src, "implicit_column_expression", None)
            if not exprs:
                # symmetric fallback (HDX-4376, queryParser.test.ts:515): a
                # source with a Body Expression but no Implicit Column
                # Expression still supports bare-text search; implicit wins
                # when both are set
                exprs = getattr(src, "body_expression", None)
        if not exprs:
            raise ValueError(
                "bare-term search requires source.implicit_column_expression"
                " (or body_expression)"
            )
        if isinstance(exprs, str):
            exprs = [exprs]
        return list(exprs)

    def _implicit_expr(self) -> str:
        exprs = self._implicit_exprs()
        if len(exprs) == 1:
            return f"coalesce({exprs[0]}, '')"
        # multi-column implicit -> concatWithSeparator(';') (queryParser.ts:1873-1911)
        joined = ", ".join(f"coalesce({e}, '')" for e in exprs)
        return f"concat_ws(';', {joined})"

    # ---------- node serialization ----------

    def _node(self, node: Node) -> str:
        if isinstance(node, MatchAll):
            return "TRUE"
        if isinstance(node, BoolOp):
            return f"({self._node(node.left)} {node.op} {self._node(node.right)})"
        if isinstance(node, Not):
            return f"(NOT {self._node(node.child)})"
        if isinstance(node, Group):
            if node.field is not None:
                pushed = _push_field(node.child, node.field)
                return self._node(pushed)
            return self._node(node.child)
        if isinstance(node, Range):
            return self._range(node)
        if isinstance(node, Term):
            return self._term(node)
        raise TypeError(f"unknown node {node!r}")

    def _term(self, t: Term) -> str:
        value = _unescape(t.value) if not t.quoted else t.value
        # restore protected special tokens AFTER escape handling, exactly
        # where the reference decodes (queryParser.ts:1949)
        value = decode_special_tokens(value)
        if t.field is None:
            return self._implicit_term(value, t.quoted, t.prefix)
        f = self.resolve(t.field)
        if f.unknown and not t.prefix and value != "*":
            # A plain identifier naming neither a schema column, a source
            # mapping, nor a materialized field. The reference passes it
            # through as a raw CH expression (an alias gamble,
            # queryParser.ts:1752-1759) — under Spark, where the full schema
            # is known, that is a guaranteed AnalysisException. When the
            # source has an implicit body column, fall back to searching the
            # body for the literal 'field:value' text instead (host:port
            # strings the encode pass didn't shield, e.g. 'myhost:8080');
            # without one, keep the reference's raw-expression passthrough.
            try:
                self._implicit_exprs()
            except ValueError:
                pass
            else:
                return self._implicit_term(
                    f"{t.field}:{value}", t.quoted, None
                )
        if t.prefix:
            return self._cmp(f, t.prefix, value)
        if not t.quoted and value == "*":
            return self._exists(f)
        if t.quoted:
            # grouped syntax keeps terms <implicit> in the reference's AST,
            # so f:("x y") never reaches the exact-equality shortcut
            # (queryParser.ts:1962-1966) — it is a substring search
            return self._contains(f, value) if t.grouped else self._eq(f, value)
        if _has_edge_wildcard(value):
            return self._wildcard(f, value)
        return self._contains(f, value)

    # field:value, unquoted -> ILIKE '%v%' (queryParser.ts:1604-1608)
    def _contains(self, f: _Field, v: str) -> str:
        if f.kind == "number":
            if _is_number(v):
                return f"{f.expr} = {_num_lit(v)}"
            return "FALSE"
        if f.kind == "bool":
            return self._bool_eq(f, v)
        if f.kind == "date":
            return f"{f.expr} = {_ts_lit(v)}"
        if f.kind == "json" and _is_number(v):
            # numeric compare on JSON value, guarded cast (queryParser.ts:1710-1726)
            return f"(try_cast({f.expr} AS DOUBLE) = {_num_lit(v)} OR lower({f.expr}) LIKE {_sql_str('%' + _like_escape(v.lower()) + '%')})"
        if f.kind == "array":
            if f.sub is not None:
                # per-element key probe (queryParser.test.ts:2166-2251
                # 'Events.Attributes.message:key1' -> arrayExists over
                # el['message'])
                e = f.elem_expr()
                pat = _sql_str("%" + _like_escape(v.lower()) + "%")
                return (
                    f"exists({f.expr}, x -> lower(cast({e} AS STRING))"
                    f" LIKE {pat})"
                )
            # numeric/boolean element arrays are EXACT membership even for
            # unquoted terms — the reference casts to the inner type and
            # emits has() (queryParser.test.ts:2124-2162 'Events.Count:5'
            # -> has(Events.Count, CAST('5','Float64')))
            if f.elem_kind == "number":
                if _is_number(v):
                    return f"exists({f.expr}, x -> x = {_num_lit(v)})"
                return "FALSE"
            if f.elem_kind == "bool":
                truthy = v.lower() in ("true", "1")
                return f"array_contains({f.expr}, {'TRUE' if truthy else 'FALSE'})"
            # string elements: substring match on any element
            # (queryParser.ts:821-908)
            pat = _sql_str("%" + _like_escape(v.lower()) + "%")
            return f"exists({f.expr}, x -> lower(cast(x AS STRING)) LIKE {pat})"
        return f"lower({f.expr}) LIKE {_sql_str('%' + _like_escape(v.lower()) + '%')}"

    # field:"value" -> exact equality (queryParser.ts:418-544)
    def _eq(self, f: _Field, v: str) -> str:
        if f.kind == "number":
            if _is_number(v):
                return f"{f.expr} = {_num_lit(v)}"
            return "FALSE"
        if f.kind == "bool":
            return self._bool_eq(f, v)
        if f.kind == "date":
            return f"{f.expr} = {_ts_lit(v)}"
        if f.kind == "array":
            if f.sub is not None:
                # arrayExists(el -> el['k'] = 'v') / toString(el.`k`) = 'v'
                e = f.elem_expr()
                return f"exists({f.expr}, x -> cast({e} AS STRING) = {_sql_str(v)})"
            if f.elem_kind == "number":
                if _is_number(v):
                    return f"exists({f.expr}, x -> x = {_num_lit(v)})"
                return "FALSE"
            if f.elem_kind == "bool":
                truthy = v.lower() in ("true", "1")
                return f"array_contains({f.expr}, {'TRUE' if truthy else 'FALSE'})"
            if f.elem_kind == "date":
                # reference: arrayExists(el -> toString(el) = '...') —
                # string comparison on the stringified element
                return f"exists({f.expr}, x -> cast(x AS STRING) = {_sql_str(v)})"
            return f"array_contains({f.expr}, {_sql_str(v)})"
        return f"{f.expr} = {_sql_str(v)}"

    def _bool_eq(self, f: _Field, v: str) -> str:
        truthy = v.lower() in ("true", "1")
        return f"{f.expr} = {'TRUE' if truthy else 'FALSE'}"

    def _wildcard(self, f: _Field, v: str) -> str:
        pat = _sql_str(_wildcard_to_like(v.lower()))
        if f.kind == "array":
            # deviation shared with scalar fields (see _wildcard_to_like):
            # the reference ignores edge wildcards on array fields too
            # (queryParser.test.ts:2108-2121 'Events.Name:foo*' compiles to
            # plain substring) — we honor the anchors the user typed
            e = f.elem_expr()
            return f"exists({f.expr}, x -> lower(cast({e} AS STRING)) LIKE {pat})"
        expr = f.expr if f.kind in ("string", "json", "expr") else f"cast({f.expr} AS STRING)"
        return f"lower({expr}) LIKE {pat}"

    def _exists(self, f: _Field) -> str:
        # notEmpty semantics (queryParser.ts:546-588)
        if f.kind in ("string", "json", "expr"):
            return f"({f.expr} IS NOT NULL AND {f.expr} != '')"
        if f.kind == "array":
            if f.sub is not None:
                # 'arr.key:*': any element with a non-empty value at the key
                # (queryParser.test.ts:2199 arrayExists(el ->
                # notEmpty(toString(el['message']))))
                e = f.elem_expr()
                return (
                    f"exists({f.expr}, x -> {e} IS NOT NULL"
                    f" AND cast({e} AS STRING) != '')"
                )
            return f"({f.expr} IS NOT NULL AND size({f.expr}) > 0)"
        if f.kind == "map":
            return f"({f.expr} IS NOT NULL AND cardinality({f.expr}) > 0)"
        return f"{f.expr} IS NOT NULL"

    def _cast_side(self, f: _Field, v: str) -> tuple[str, str]:
        """lhs/rhs for ordered comparison with type dispatch."""
        if f.kind == "date":
            return f.expr, _ts_lit(v)
        if f.kind == "number":
            return f.expr, _num_lit(v) if _is_number(v) else "NULL"
        if _is_number(v):
            return f"try_cast({f.expr} AS DOUBLE)", _num_lit(v)
        return f.expr, _sql_str(v)

    def _cmp(self, f: _Field, op: str, v: str) -> str:
        if f.kind == "array":
            # queryParser.test.ts:2018-2048: ordered comparisons on
            # Array-type fields are a loud user-facing error
            raise ValueError(
                f"{op} comparison is not supported for Array-type fields"
            )
        lhs, rhs = self._cast_side(f, v)
        return f"{lhs} {op} {rhs}"

    def _range(self, r: Range) -> str:
        if r.field is None:
            raise ValueError("range query requires a field")
        f = self.resolve(r.field)
        if f.kind == "array" and (r.low != "*" or r.high != "*"):
            # queryParser.test.ts:2050-2057; [* TO *] still degrades to the
            # exists check below, which is well-defined for arrays
            raise ValueError(
                "range comparison is not supported for Array-type fields"
            )
        conds = []
        if r.low != "*":
            lhs, rhs = self._cast_side(f, r.low)
            conds.append(f"{lhs} {'>=' if r.include_low else '>'} {rhs}")
        if r.high != "*":
            lhs, rhs = self._cast_side(f, r.high)
            conds.append(f"{lhs} {'<=' if r.include_high else '<'} {rhs}")
        if not conds:
            # field:[* TO *] == exists — the reference compiles it to the
            # same notEmpty check as field:* (queryParser.test.ts:762
            # 'ServiceName:[* TO *]' -> notEmpty(ServiceName) = 1)
            return self._exists(f)
        return "(" + " AND ".join(conds) + ")"

    # bare term -> implicit column token search (queryParser.ts:1578-1600)
    def _implicit_term(self, value: str, quoted: bool, prefix: Optional[str]) -> str:
        body = self._implicit_expr()
        if prefix:
            # comparison on the implicit column (numeric body)
            lhs = f"try_cast({body} AS DOUBLE)"
            return f"{lhs} {prefix} {_num_lit(value) if _is_number(value) else 'NULL'}"
        if quoted:
            # a quoted implicit phrase is NOT a plain substring: the
            # reference's quoted-exact shortcut applies only to explicit
            # fields (ts:1962-1966 isImplicitField guard), so "abc def"
            # takes the same token-search path as a bare term — hasToken
            # per token plus the whole-phrase substring when separators
            # are present (reference test: '"foo bar baz"' compiles to 3
            # hasTokens AND the LIKE). Wildcards never fire inside quotes
            # (the strip checks !quoted, ts:1996-2005), hence the direct
            # jump to the token path.
            return self._implicit_tokens(value, body)
        if _has_edge_wildcard(value):
            return f"lower({body}) LIKE {_sql_str(_wildcard_to_like(value.lower()))}"
        return self._implicit_tokens(value, body)

    def _implicit_tokens(self, value: str, body: str) -> str:
        tokens = [tok for tok in re.split(_NEEDLE_SPLIT_RE, value.lower()) if tok]
        conds = [
            f"array_contains(split(lower({body}), '{_HAYSTACK_SPLIT_SQL}'), {_sql_str(tok)})"
            for tok in tokens
        ]
        if re.search(_NEEDLE_SPLIT_RE, value):
            # separators present -> exact whole-term substring too
            # (queryParser.ts:1581-1593; a separator-free term is
            # token-only, :1596-1599 — 'café' searches as ONE token)
            conds.append(
                f"lower({body}) LIKE {_sql_str('%' + _like_escape(value.lower()) + '%')}"
            )
        if not conds:
            return "TRUE"
        return "(" + " AND ".join(conds) + ")" if len(conds) > 1 else conds[0]


def _push_field(node: Node, field: str) -> Node:
    """field:(a OR b) — inner implicit terms inherit the field (queryParser.ts:2035)."""
    if isinstance(node, Term):
        if node.field is None:
            return Term(
                node.value, field=field, quoted=node.quoted,
                prefix=node.prefix, grouped=True,
            )
        return node
    if isinstance(node, Range):
        if node.field is None:
            return Range(field, node.low, node.high, node.include_low, node.include_high)
        return node
    if isinstance(node, BoolOp):
        return BoolOp(node.op, _push_field(node.left, field), _push_field(node.right, field))
    if isinstance(node, Not):
        return Not(_push_field(node.child, field))
    if isinstance(node, Group):
        return Group(_push_field(node.child, field), field=node.field)
    return node


def lucene_to_column(query: str, schema: StructType, source=None):
    """Parse + serialize to a pyspark Column."""
    from pyspark.sql import functions as F

    return F.expr(SearchQueryBuilder(schema, source).build(query))
