"""ClickHouse-expression compatibility shim.

The reference's "UDF surface" is the whole ClickHouse function namespace —
users paste raw CH SQL into selects/wheres/source mappings
(renderChartConfig.ts:703 UNSAFE_RAW_SQL). Our expression language is Spark
SQL; this shim rewrites the CH idioms that show up in real source configs and
dashboards into Spark SQL so those configs keep working (SURVEY.md §2.12).

This is a *name-level* rewrite of function calls, not a SQL parser — enough
for the expression fragments ChartConfigs contain. Unknown functions pass
through untouched and fail (loudly) at Spark analysis time.
"""

from __future__ import annotations

import re

# CH name -> Spark name; names starting with '_' get structural rewrites in
# _rewrite_call, everything else is a plain rename
_RENAMES = {
    "toString": "_tostring",
    "toStartOfInterval": "_tostartofinterval",
    "toStartOfDay": "_tostartofday",
    "toStartOfHour": "_tostartofhour",
    "toStartOfMinute": "_tostartofminute",
    "toStartOfWeek": "_tostartofweek",
    "toStartOfMonth": "_tostartofmonth",
    "toDate": "to_date",
    "toUnixTimestamp": "unix_timestamp",
    "fromUnixTimestamp": "timestamp_seconds",
    "JSONExtractString": "_jsonextractstring",
    "has": "array_contains",
    "mapContains": "map_contains_key",
    "argMax": "max_by",
    "argMin": "min_by",
    "anyLast": "_anylast",
    "cityHash64": "xxhash64",  # identity use only — hash values differ from CH
    "farmFingerprint64": "xxhash64",
    "position": "instr",
    "lcase": "lower",
    "ucase": "upper",
    "empty": "_empty",
    "notEmpty": "_notempty",
    "multiIf": "_multiif",
    "toFloat64OrDefault": "_tofloat64ordefault",
    "toFloat64OrNull": "_tofloat64ornull",
    "toFloat64": "_tofloat64",
    "toInt64OrNull": "_toint64ornull",
    "toInt64": "_toint64",
    "toUInt64OrZero": "_touint64orzero",
    "toUInt64": "_toint64",  # integer semantics (CH returns UInt64, not float)
    "intDiv": "_intdiv",
    "arrayJoin": "explode",
    "arrayConcat": "concat",
    "arrayCompact": "_arraycompact",
    "arraySum": "_arraysum",
    "lengthUTF8": "char_length",
    "countIf": "count_if",
    "formatDateTime": "_formatdatetime",
    "toDateTime": "_todatetime",
    "now": "current_timestamp",
    "ifNull": "coalesce",
    "assumeNotNull": "_assumenotnull",
    "splitByChar": "_splitbychar",
    "replaceRegexpAll": "_replaceregexpall",
    "replaceAll": "replace",
    "extractAll": "_extractall",
    "startsWith": "startswith",
    "endsWith": "endswith",
    "dateDiff": "_datediff",
    "toStartOfFiveMinutes": "_tostartoffiveminute",  # structural (not date_trunc)
    "toStartOfFifteenMinutes": "_tostartoffifteenminute",
    "toYYYYMM": "_toyyyymm",
    "toHour": "hour",
    "toMinute": "minute",
    "toDayOfWeek": "_todayofweek",
    "arrayDistinct": "array_distinct",
    "arraySort": "sort_array",
    "arrayReverse": "reverse",
    "indexOf": "array_position",
    "JSONExtractInt": "_jsonextractint",
    "JSONExtractFloat": "_jsonextractfloat",
    "JSONHas": "_jsonhas",
    "isNull": "isnull",
    "isNotNull": "isnotnull",
    "least": "_least",
    "greatest": "_greatest",
    "substringUTF8": "substring",
    "trimBoth": "trim",
    "concatWithSeparator": "concat_ws",
    # r6: the remaining function families the reference's query generator
    # emits (search path tokens, conditional aggregates, array HOFs)
    "hasToken": "_hastoken",
    "hasTokenCaseInsensitive": "_hastokenci",
    # the reference's text-index tier emits these (queryParser.ts:1520-1529
    # batches hasAllTokens at 50 tokens for CH's 64-token cap; Spark's
    # forall has no such cap, so one call covers any batch)
    "hasAllTokens": "_hasalltokens",
    "hasAnyTokens": "_hasanytokens",
    "match": "regexp_like",
    "sumIf": "_sumif",
    "avgIf": "_avgif",
    "minIf": "_minif",
    "maxIf": "_maxif",
    "hasAny": "arrays_overlap",
    "hasAll": "_hasall",
    "arrayExists": "_arrayexists",
    "arrayMap": "_arraymap",
    "arrayFilter": "_arrayfilter",
    # r13: the row side-panel's exact-row WHERE (useRowWhere.tsx:35-130)
    # emits these three
    "parseDateTime64BestEffort": "_parsedt64be",
    "MD5": "_md5bin",
    "leftUTF8": "_leftutf8",
}

_CALL_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")


def _split_args(s: str) -> list[str]:
    """Split top-level comma-separated args (respects quotes/parens)."""
    args, depth, buf, i = [], 0, [], 0
    in_str: str | None = None
    while i < len(s):
        c = s[i]
        if in_str:
            buf.append(c)
            if c == "\\":
                if i + 1 < len(s):
                    buf.append(s[i + 1])
                    i += 1
            elif c == in_str:
                in_str = None
        elif c in "'\"":
            in_str = c
            buf.append(c)
        elif c in "([":
            depth += 1
            buf.append(c)
        elif c in ")]":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        args.append("".join(buf).strip())
    return args


def _find_close(s: str, start: int) -> int:
    """Index of the ')' matching the '(' at s[start]."""
    depth, i = 0, start
    in_str: str | None = None
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == in_str:
                in_str = None
        elif c in "'\"":
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced parens in expression: {s!r}")


def _rewrite_call(name: str, args: list[str]) -> str:
    low = name
    if low == "_tostring":
        return f"cast({args[0]} AS STRING)"
    if low == "_tofloat64ordefault":
        default = args[1] if len(args) > 1 else "0.0"
        return f"coalesce(try_cast({args[0]} AS DOUBLE), {default})"
    if low == "_tofloat64ornull":
        return f"try_cast({args[0]} AS DOUBLE)"
    if low == "_tofloat64":
        return f"cast({args[0]} AS DOUBLE)"
    if low == "_toint64ornull":
        return f"try_cast({args[0]} AS BIGINT)"
    if low == "_toint64":
        return f"cast({args[0]} AS BIGINT)"
    if low == "_touint64orzero":
        return f"coalesce(try_cast({args[0]} AS BIGINT), 0)"
    if low == "_intdiv":
        # CH intDiv rounds DOWN (toward -inf, per its docs); Spark's `div`
        # truncates toward zero — subtract 1 when signs differ and the
        # division is inexact (intDiv(-7, 2) = -4, not -3)
        a, b = args[0], args[1]
        return (
            f"((({a}) div ({b})) - CASE WHEN (({a}) % ({b})) != 0 "
            f"AND ((({a}) < 0) != (({b}) < 0)) THEN 1 ELSE 0 END)"
        )
    if low == "_parsedt64be":
        # parseDateTime64BestEffort(s[, precision[, tz]]): best-effort ISO
        # parse; Spark's timestamp cast covers the ISO-8601 family incl.
        # 'T' and 'Z' (the shapes the row panel renders). Precision arg
        # dropped — Spark timestamps are micros.
        return f"cast({args[0]} AS TIMESTAMP)"
    if low == "_md5bin":
        # CH MD5() returns BINARY (FixedString(16)); Spark md5() returns
        # lowercase hex. unhex() restores the binary so the reference's
        # lower(hex(MD5(x))) composition lands on the same lowercase hex.
        return f"unhex(md5({args[0]}))"
    if low == "_leftutf8":
        # leftUTF8(s, n): first n code points — Spark substring on strings
        # is code-point based.
        return f"substring({args[0]}, 1, {args[1]})"
    if low == "_empty":
        return f"({args[0]} IS NULL OR {args[0]} = '')"
    if low == "_notempty":
        return f"({args[0]} IS NOT NULL AND {args[0]} != '')"
    if low == "_arraysum":
        # CH skips NULL elements (arraySum([1, NULL, 2]) = 3); a bare
        # acc + x would poison the whole sum
        return (
            f"aggregate({args[0]}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + coalesce(x, CAST(0 AS DOUBLE)))"
        )
    if low == "_jsonextractstring":
        # CH JSONExtract* return the TYPE DEFAULT on a missing key ('' /
        # 0 / 0.0), not NULL; NULL input still propagates
        col, keys = args[0], args[1:]
        path = "$." + ".".join(k.strip().strip("'\"") for k in keys)
        return (
            f"if({col} IS NULL, NULL, "
            f"coalesce(get_json_object({col}, '{path}'), ''))"
        )
    if low == "_multiif":
        # multiIf(c1, v1, c2, v2, ..., else) -> CASE WHEN
        parts = ["CASE"]
        i = 0
        while i + 1 < len(args):
            parts.append(f"WHEN {args[i]} THEN {args[i + 1]}")
            i += 2
        parts.append(f"ELSE {args[-1]} END")
        return " ".join(parts)
    if low == "_tostartofinterval":
        # CH's bucketing workhorse: toStartOfInterval(t, INTERVAL n unit).
        # Sub-day intervals align to the epoch (unix div); week to the
        # first epoch Monday 1970-01-05; month/quarter/year to 1970-01.
        m = re.fullmatch(
            r"(?i)INTERVAL\s+(\d+)\s+"
            r"(second|minute|hour|day|week|month|quarter|year)s?",
            args[1].strip(),
        )
        if m:
            n, unit = int(m.group(1)), m.group(2).lower()
            if unit in ("second", "minute", "hour", "day"):
                secs = n * {"second": 1, "minute": 60, "hour": 3600,
                            "day": 86400}[unit]
                return (
                    f"timestamp_seconds((unix_timestamp({args[0]}) "
                    f"div {secs}) * {secs})"
                )
            if n == 1:
                # CH returns Date for week/month/quarter/year intervals
                return f"to_date(date_trunc('{unit}', {args[0]}))"
            if unit == "week":
                step = 7 * n
                return (
                    f"date_add(DATE'1970-01-05', cast(((datediff(to_date("
                    f"{args[0]}), DATE'1970-01-05')) div {step}) * {step} "
                    f"AS INT))"
                )
            months = n * {"month": 1, "quarter": 3, "year": 12}[unit]
            return (
                f"add_months(DATE'1970-01-01', (((year({args[0]}) - 1970) "
                f"* 12 + month({args[0]}) - 1) div {months}) * {months})"
            )
        return f"date_trunc({args[1]}, {args[0]})"  # named-unit string form
    if low == "_tostartoffiveminute":
        return f"timestamp_seconds((unix_timestamp({args[0]}) div 300) * 300)"
    if low == "_tostartoffifteenminute":
        return f"timestamp_seconds((unix_timestamp({args[0]}) div 900) * 900)"
    if low == "_todatetime":
        return f"cast({args[0]} AS TIMESTAMP)"
    if low == "_assumenotnull":
        return args[0]
    if low == "_splitbychar":
        sep = args[0].strip()
        if len(sep) >= 2 and sep[0] in "'\"" and sep[-1] == sep[0]:
            lit = re.escape(sep[1:-1]).replace("\\", "\\\\")
            return f"split({args[1]}, '{lit}', -1)"
        return f"split({args[1]}, {args[0]}, -1)"
    if low == "_replaceregexpall":
        # CH backreferences are \1..\9; Spark (Java) uses $1..$9
        repl = re.sub(r"\\\\?(\d)", r"$\1", args[2])
        return f"regexp_replace({args[0]}, {args[1]}, {repl})"
    if low == "_extractall":
        # CH: whole match unless the pattern has a capture group
        pat = args[1]
        idx = 1 if "(" in pat.strip("'\"") else 0
        return f"regexp_extract_all({args[0]}, {args[1]}, {idx})"
    if low == "_datediff":
        # CH dateDiff counts UNIT-BOUNDARY CROSSINGS, not complete units:
        # dateDiff('day', '...23:00', next-day '...01:00') = 1 where a raw
        # timestampdiff says 0. Truncate both endpoints to the unit first
        # (exact on truncated values for every supported unit; 'week'
        # truncates to Monday, matching CH's Monday-based week diff).
        unit = args[0].strip().strip("'\"").lower()
        return (
            f"timestampdiff({unit}, date_trunc('{unit}', {args[1]}), "
            f"date_trunc('{unit}', {args[2]}))"
        )
    if low == "_toyyyymm":
        return f"cast(date_format({args[0]}, 'yyyyMM') AS INT)"
    if low == "_todayofweek":
        # CH: 1 = Monday; Spark dayofweek: 1 = Sunday
        return f"((dayofweek({args[0]}) + 5) % 7 + 1)"
    if low == "_jsonextractint":
        col, keys = args[0], args[1:]
        path = "$." + ".".join(k.strip().strip("'\"") for k in keys)
        return (
            f"if({col} IS NULL, NULL, coalesce(try_cast("
            f"get_json_object({col}, '{path}') AS BIGINT), 0))"
        )
    if low == "_jsonextractfloat":
        col, keys = args[0], args[1:]
        path = "$." + ".".join(k.strip().strip("'\"") for k in keys)
        return (
            f"if({col} IS NULL, NULL, coalesce(try_cast("
            f"get_json_object({col}, '{path}') AS DOUBLE), 0.0))"
        )
    if low == "_jsonhas":
        col, keys = args[0], args[1:]
        path = "$." + ".".join(k.strip().strip("'\"") for k in keys)
        return f"(get_json_object({col}, '{path}') IS NOT NULL)"
    if low == "_hastoken":
        # CH tokenizes the haystack on non-alphanumeric *ASCII* bytes and
        # checks exact (case-sensitive) token membership — the primitive
        # the reference's search path compiles full-text terms into. Bytes
        # >= 0x80 stay INSIDE tokens (hasToken('café','café') = 1 in CH),
        # so the separator class is ASCII-only: Java's \p{Punct}+\p{Space}+
        # \p{Cntrl} is exactly 0x00-0x2F,0x3A-0x40,0x5B-0x60,0x7B-0x7F —
        # ASCII minus [a-zA-Z0-9].
        return (
            f"array_contains(split({args[0]}, "
            f"'[\\\\p{{Punct}}\\\\p{{Space}}\\\\p{{Cntrl}}]+'), {args[1]})"
        )
    if low in ("_hasalltokens", "_hasanytokens"):
        # hasAllTokens/hasAnyTokens(haystack, ['a', 'b']): every/any token
        # present under the same ASCII separator class as hasToken. CH's
        # bracket array literal becomes Spark's array(...)
        arr = args[1].strip()
        if arr.startswith("[") and arr.endswith("]"):
            arr = f"array({arr[1:-1]})"
        hof = "forall" if low == "_hasalltokens" else "exists"
        return (
            f"{hof}({arr}, t -> array_contains(split({args[0]}, "
            f"'[\\\\p{{Punct}}\\\\p{{Space}}\\\\p{{Cntrl}}]+'), t))"
        )
    if low == "_hastokenci":
        # CH folds case ASCII-only here (byte-level tokenizer + tolower):
        # hasTokenCaseInsensitive('CAFÉ','café') is 0 in CH because É is
        # not folded. translate() over A-Z/a-z reproduces the ASCII fold
        # exactly; a full-Unicode lower() would over-match.
        upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        lower_ = "abcdefghijklmnopqrstuvwxyz"
        fold = "translate({}, '" + upper + "', '" + lower_ + "')"
        return (
            f"array_contains(split({fold.format(args[0])}, "
            f"'[\\\\p{{Punct}}\\\\p{{Space}}\\\\p{{Cntrl}}]+'), "
            f"{fold.format(args[1])})"
        )
    if low == "_sumif":
        # CH sumIf over zero matching rows is 0, not NULL
        return f"coalesce(sum(CASE WHEN {args[1]} THEN {args[0]} END), 0)"
    if low == "_avgif":
        # CH avgIf over zero matching rows is NaN
        return (
            f"coalesce(avg(CASE WHEN {args[1]} THEN {args[0]} END), "
            f"cast('NaN' AS DOUBLE))"
        )
    if low == "_minif":
        # CH minIf/maxIf over zero matching rows return the type default
        # (0), same as the sibling sumIf — not NULL
        return f"coalesce(min(CASE WHEN {args[1]} THEN {args[0]} END), 0)"
    if low == "_maxif":
        return f"coalesce(max(CASE WHEN {args[1]} THEN {args[0]} END), 0)"
    if low == "_hasall":
        # hasAll(a, b): a contains every element of b (empty b -> true)
        return f"(size(array_except({args[1]}, {args[0]})) = 0)"
    if low == "_arrayexists":
        # CH array HOFs take the lambda FIRST; Spark takes it last. The
        # `x -> expr` lambda syntax is identical in both dialects.
        return f"exists({args[1]}, {args[0]})"
    if low == "_arraymap":
        return f"transform({args[1]}, {args[0]})"
    if low == "_arrayfilter":
        return f"filter({args[1]}, {args[0]})"
    if low == "_tostartofweek":
        # CH toStartOfWeek default mode 0 starts weeks on SUNDAY and
        # returns a Date; Spark's date_trunc('week') starts Monday.
        # Spark dayofweek: 1=Sunday..7=Saturday -> offset = dayofweek-1.
        # An explicit mode argument (1/3 = Monday) maps to date_trunc.
        if len(args) > 1 and args[1].strip() in ("1", "3"):
            return f"to_date(date_trunc('week', {args[0]}))"
        return f"date_sub(to_date({args[0]}), dayofweek({args[0]}) - 1)"
    if low == "_arraycompact":
        # CH arrayCompact removes CONSECUTIVE duplicates only (run-length
        # dedup), not all duplicates — array_distinct would be wrong on
        # [1,1,2,1]. element_at is 1-based, filter's index 0-based, so
        # element_at(a, i) is the previous element.
        a = args[0]
        return f"filter({a}, (x, i) -> i = 0 OR NOT (x <=> element_at({a}, i)))"
    if low == "_formatdatetime":
        return _format_datetime(args)
    if low == "_anylast":
        # CH aggregate functions skip NULLs; Spark's last() keeps them by
        # default — pass ignoreNulls explicitly
        return f"last({args[0]}, true)"
    if low in ("_least", "_greatest"):
        # CH least/greatest propagate NULL (any NULL argument -> NULL);
        # Spark's skip NULLs and return the least/greatest NON-NULL value
        fn = low[1:]
        null_any = " OR ".join(f"({a}) IS NULL" for a in args)
        return (
            f"(CASE WHEN {null_any} THEN NULL"
            f" ELSE {fn}({', '.join(args)}) END)"
        )
    if low.startswith("_tostartof"):
        unit = low[len("_tostartof"):]
        return f"date_trunc('{unit}', {args[0]})"
    return f"{low}({', '.join(args)})"


# ClickHouse formatDateTime uses MySQL-style % patterns; Spark date_format
# takes Java SimpleDateFormat patterns. %M follows modern CH defaults
# (formatdatetime_format_without_leading_zeros era: month NAME; the minute
# is %i). Literal letters in the format must be single-quoted for Java.
_CH_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd",
    "H": "HH", "h": "hh", "I": "hh", "i": "mm", "s": "ss",
    "S": "ss", "f": "SSSSSS", "p": "a", "j": "DDD", "a": "EEE",
    "W": "EEEE", "M": "MMMM", "b": "MMM", "Q": "Q", "g": "yy", "G": "yyyy",
    "F": "yyyy-MM-dd", "D": "MM/dd/yy", "T": "HH:mm:ss", "R": "HH:mm",
    "n": "'\n'", "t": "'\t'", "%": "'%'",
}
# CH %e / %k are SPACE-padded day / hour — Java has no space-padded
# pattern, so these render as lpad(date_format(t, 'd'|'H'), 2, ' ')
# segments concatenated around the plain date_format pieces
_CH_FMT_PAD = {"e": "d", "k": "H"}


def _format_datetime(args: list[str]) -> str:
    """formatDateTime(t, 'fmt') -> date_format(t, java_fmt): translate the
    % tokens and single-quote every literal run so stray letters don't
    become accidental Java pattern characters. A non-literal format
    expression passes through untranslated (fails loudly at analysis if
    the patterns differ)."""
    fmt = args[1].strip() if len(args) > 1 else ""
    if not (len(fmt) >= 2 and fmt[0] in "'\"" and fmt[-1] == fmt[0]):
        return f"date_format({args[0]}, {', '.join(args[1:])})"
    body = fmt[1:-1]
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if lit:
            text = "".join(lit)
            if any(c.isalpha() for c in text) or "'" in text:
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            lit.clear()

    pads: list[tuple[int, str]] = []  # (position in out, java pattern)
    i = 0
    while i < len(body):
        c = body[i]
        if c == "%" and i + 1 < len(body):
            tok = body[i + 1]
            if tok in _CH_FMT:
                flush()
                out.append(_CH_FMT[tok])
                i += 2
                continue
            if tok in _CH_FMT_PAD:
                flush()
                pads.append((len(out), _CH_FMT_PAD[tok]))
                out.append("")  # placeholder: splits the format here
                i += 2
                continue
        lit.append(c)
        i += 1
    flush()

    def _fmt(java: str) -> str:
        # double-quoted SQL literal: the Java pattern quotes literal runs
        # with single quotes, which would end a single-quoted SQL string
        return f'date_format({args[0]}, "{java}")'

    if not pads:
        return _fmt("".join(out).replace('"', '\\"'))
    # space-padded tokens: concat plain segments with lpad'd ones
    pieces: list[str] = []
    pad_at = dict(pads)
    seg: list[str] = []
    for idx, part in enumerate(out):
        if idx in pad_at:
            if seg:
                pieces.append(_fmt("".join(seg).replace('"', '\\"')))
                seg = []
            pieces.append(f"lpad({_fmt(pad_at[idx])}, 2, ' ')")
        else:
            seg.append(part)
    if seg:
        pieces.append(_fmt("".join(seg).replace('"', '\\"')))
    return "concat(" + ", ".join(pieces) + ")"


def translate_expr(expr: str) -> str:
    """Rewrite ClickHouse function idioms in *expr* to Spark SQL."""
    out = []
    i = 0
    while i < len(expr):
        m = _CALL_RE.search(expr, i)
        if not m:
            out.append(expr[i:])
            break
        name = m.group(1)
        if name not in _RENAMES:
            out.append(expr[i : m.end()])
            i = m.end()
            continue
        open_idx = m.end() - 1
        close_idx = _find_close(expr, open_idx)
        inner = translate_expr(expr[open_idx + 1 : close_idx])
        args = _split_args(inner)
        mapped = _RENAMES[name]
        out.append(expr[i : m.start()])
        if mapped.startswith("_"):
            out.append(_rewrite_call(mapped, args))
        else:
            out.append(f"{mapped}({', '.join(args)})")
        i = close_idx + 1
    return "".join(out)


# ---- ClickHouse type-string classification (clickhouse/index.ts:40-117) ----

# JSDataType values, spelled as the reference's enum strings
JS_DATA_TYPES = (
    "array", "date", "map", "number", "string", "tuple", "bool", "json",
    "dynamic",
)


def convert_ch_data_type_to_js_type(data_type: str) -> "str | None":
    """clickhouse/index.ts:60-104 convertCHDataTypeToJSType: classify a
    ClickHouse type STRING into the client's JS type family — prefix
    matched in the reference's exact order (``Date*`` wins before the
    wrappers; ``LowCardinality(...)`` and ``Nullable(...)`` recurse),
    None for unknowns. Used wherever column metadata arrives as CH type
    text rather than a Spark schema (e.g. imported Source definitions)."""
    dt = data_type
    if dt.startswith("Date"):
        return "date"
    if dt.startswith("Tuple"):
        return "tuple"
    if dt.startswith("Map"):
        return "map"
    if dt.startswith("Array"):
        return "array"
    if dt.startswith(("Int", "UInt", "Float",
                      "Nullable(Int", "Nullable(UInt", "Nullable(Float")):
        return "number"
    if dt.startswith(("String", "Nullable(String)", "FixedString", "Enum",
                      "UUID", "IPv4", "IPv6")):
        return "string"
    if dt == "Bool":
        return "bool"
    if dt.startswith("JSON"):
        return "json"
    if dt.startswith("Dynamic"):
        return "dynamic"
    if dt.startswith("LowCardinality"):
        return convert_ch_data_type_to_js_type(dt[15:-1])
    if dt.startswith("Nullable("):
        return convert_ch_data_type_to_js_type(dt[9:-1])
    return None


def is_js_data_type_json_stringifiable(js_type: "str | None") -> bool:
    """clickhouse/index.ts:106-117: container-ish families render as JSON."""
    return js_type in ("map", "array", "json", "tuple", "dynamic")


_DT64_RE = re.compile(r"^DateTime64\(\s*(\d+)\s*(?:,[^)]*)?\)$", re.IGNORECASE)
_NULLABLE_RE = re.compile(r"^Nullable\((.*)\)$", re.IGNORECASE)


def classify_timestamp_type(type_str: "str | None"):
    """core/utils.ts:153-174 classifyTimestampType: a CH timestamp type
    string → ``{"kind", "precision"}`` (Date/Date32 = day precision -1,
    DateTime = 0, DateTime64(p) = p), None for non-timestamp types.  One
    Nullable() wrapper is looked through; timezone arguments ignored."""
    if not type_str:
        return None
    inner = _NULLABLE_RE.sub(r"\1", type_str).strip()
    if re.fullmatch(r"Date(?:32)?", inner, re.IGNORECASE):
        return {"kind": "date", "precision": -1}
    if re.fullmatch(r"DateTime|DateTime\('[^']*'\)", inner, re.IGNORECASE):
        return {"kind": "datetime", "precision": 0}
    m = _DT64_RE.match(inner)
    if m:
        return {"kind": "datetime64", "precision": int(m.group(1))}
    return None
