"""JS numeric coercion/printing quirks, shared by every surface that
mirrors a reference code path built on ``Number(str)`` / ``String(num)``
(Prometheus API params, mergePath array indices, template value
rendering). One implementation so a fidelity fix lands everywhere."""

from __future__ import annotations

from typing import Optional

_INF = float("inf")


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
