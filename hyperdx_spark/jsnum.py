"""JS numeric coercion/printing quirks, shared by every surface that
mirrors a reference code path built on ``Number(str)`` / ``String(num)``
(Prometheus API params, mergePath array indices, template value
rendering). One implementation so a fidelity fix lands everywhere."""

from __future__ import annotations

import re
from typing import Optional

_INF = float("inf")

# ECMA-262 date-time forms: a time part requires the FULL YYYY-MM-DD
# before the designator (new Date('2024-01T10:00') is NaN), so the
# date-only and date-time alternatives are spelled separately
_ISO_DATE_RE = re.compile(
    r"^(\d{4})(?:-(\d{2})(?:-(\d{2}))?)?\Z"
    r"|^(\d{4})-(\d{2})-(\d{2})"
    r"[T ](\d{2}):(\d{2})(?::(\d{2}))?(?:\.(\d+))?"
    r"(Z|[+-]\d{2}:?\d{2})?\Z"
)


def js_date_ms(value: str) -> Optional[float]:
    """``new Date(string).getTime()`` — epoch milliseconds, or None where
    JS yields NaN.  Covers the ISO-8601 family (date-only, date-time with
    ``T`` or space separator, any-length fraction truncated to JS's
    millisecond precision, ``Z``/offset designators) plus RFC 2822 via the
    stdlib email parser.  Deviations, documented: a designator-less
    date-time is treated as UTC (the engine's naive-=-UTC convention; JS
    uses the host's local zone), and V8's looser legacy forms ('Jan 1
    2024', 'May 2024') do not parse."""
    from datetime import datetime, timedelta, timezone

    s = str(value).strip()
    if not s:
        return None  # Date('') is NaN
    m = _ISO_DATE_RE.match(s)
    if m:
        g = m.groups()
        if g[0] is not None:  # date-only branch
            y, mo, d = g[0], g[1], g[2]
            hh = mi = ss = frac = off = None
        else:  # full date-time branch
            y, mo, d, hh, mi, ss, frac, off = g[3:]
        try:
            dt = datetime(
                int(y), int(mo or 1), int(d or 1),
                int(hh or 0), int(mi or 0), int(ss or 0),
                tzinfo=timezone.utc,
            )
        except ValueError:
            return None  # out-of-range component: JS also yields NaN
        ms = int((frac or "")[:3].ljust(3, "0") or 0)
        if off and off != "Z":
            sign = 1 if off[0] == "+" else -1
            dt -= sign * timedelta(
                hours=int(off[1:3]), minutes=int(off[-2:])
            )
        return dt.timestamp() * 1000 + ms
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(s)
    except (ValueError, TypeError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp() * 1000


def js_number(s: str) -> Optional[float]:
    """``Number(str)`` for string inputs: '' (or whitespace) is 0, decimal
    and exponent forms parse, ``0x``/``0o``/``0b`` literals parse,
    ``Infinity`` parses; underscore separators, 'nan', and anything else
    are NaN (None). Python's ``float`` accepts '1_0' and 'nan' — JS does
    not, so both are rejected here."""
    t = s.strip()
    if t == "":
        return 0.0
    if "_" in t:
        return None
    body = t[1:] if t[:1] in "+-" else t
    if body[:2].lower() in ("0x", "0o", "0b"):
        if t[:1] in "+-":
            return None  # JS: sign + radix literal is NaN
        try:
            return float(int(t, 0))
        except ValueError:
            return None
        except OverflowError:
            return _INF  # JS: an over-wide radix literal is Infinity
    try:
        v = float(t)
    except ValueError:
        return None
    if v != v:
        return None  # 'nan' strings: Python parses, JS Number() does not
    if v in (_INF, -_INF) and body != "Infinity" and not (
        body[:1].isdigit() or body[:1] == "."
    ):
        # Python float() accepts 'inf'/'INFINITY'; JS only exact 'Infinity'
        # (numeric overflow like '1e999' IS Infinity in both)
        return None
    return v


def js_number_str(v: float) -> str:
    """``String(number)``: integers under 1e21 print without a decimal
    point; JS uses DECIMAL notation while the base-10 exponent is in
    (-7, 21) and exponential outside it, with 'e+'/'e-' and no zero-padded
    exponent — Python's repr flips to exponential far earlier (~1e16 /
    <1e-4), so the band in between is expanded via Decimal."""
    f = float(v)
    if f != f:
        return "NaN"
    if f == _INF:
        return "Infinity"
    if f == -_INF:
        return "-Infinity"
    if f == 0:
        return "0"  # JS String(-0) is '0'
    # everything derives from repr — Python's shortest-round-trip digits
    # are the SAME digits JS's shortest-round-trip printer picks (above
    # 2^53 the exact integer digits differ from the shortest ones:
    # String(123456789123456789) is '123456789123456780', not the exact
    # double value '...784')
    r = repr(f)
    if "e" not in r and "E" not in r:
        return r[:-2] if r.endswith(".0") else r
    from decimal import Decimal

    mantissa, _, exp_s = r.lower().partition("e")
    exp = int(exp_s)
    if -7 < exp < 21:
        return format(Decimal(r), "f")
    sign = "+" if exp >= 0 else "-"
    return f"{mantissa}e{sign}{abs(exp)}"
