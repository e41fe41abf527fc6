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
    low = t.lower()
    if "_" in t or low in ("nan", "+nan", "-nan"):
        return None
    body = t[1:] if t[:1] in "+-" else t
    if body[:2].lower() in ("0x", "0o", "0b"):
        if t[:1] in "+-":
            return None  # JS: sign + radix literal is NaN
        try:
            return float(int(t, 0))
        except ValueError:
            return None
    try:
        v = float(t)
    except ValueError:
        return None
    return None if v != v else v


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
    if f.is_integer() and abs(f) < 1e21:
        return str(int(f))
    r = repr(f)
    if "e" not in r and "E" not in r:
        return r
    from decimal import Decimal

    mantissa, _, exp_s = r.lower().partition("e")
    exp = int(exp_s)
    if -7 < exp < 21:
        out = format(Decimal(r), "f")
        return out
    sign = "+" if exp >= 0 else "-"
    return f"{mantissa}e{sign}{abs(exp)}"
