"""Alert notification payload builders + delivery.

Parity target: hyperdxio/hyperdx
``packages/api/src/tasks/checkAlerts/template.ts`` — Slack block payload
(:243-262), generic webhook with a Handlebars body template over an escaped
view (:281-404, default template :141), title building with state emoji
(:442-489) — and ``packages/api/src/routers/api/webhooks.ts`` delivery
rules (POST, redirects disallowed).

Payload construction is pure (unit-testable, no network); ``send_webhook``
does the driver-side POST.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Optional

DEFAULT_GENERIC_WEBHOOK_BODY_TEMPLATE = (
    '{"text": "{{title}} | {{body}} | {{link}} | {{state}} | {{startTime}}'
    ' | {{endTime}} | {{eventId}}"}'
)


@dataclass
class Message:
    """template.ts Message: what an alert evaluation produced."""

    title: str
    body: str
    hdx_link: str = ""
    state: str = "ALERT"  # AlertState value
    start_time: str = ""
    end_time: str = ""
    event_id: str = ""


def escape_json_string(s: str) -> str:
    """template.ts escapeJsonString — make a value safe to splice inside a
    JSON string literal."""
    return json.dumps(s)[1:-1]


def build_title(
    name: str,
    value: float,
    state: str = "ALERT",
    template: Optional[str] = None,
    view: Optional[dict] = None,
) -> str:
    """buildAlertMessageTemplateTitle (template.ts:442-489): emoji prefix by
    state, default '<name> - <value> lines found' body."""
    emoji = "✅ " if state == "OK" else "\U0001f6a8 "
    if template:
        base = render_template(template, view or {}, no_escape=False)
    else:
        base = f'Alert for "{name}" - {_js_num_str(value)} lines found'
    return emoji + base


_OPERAND = r"""('[^']*'|"[^"]*"|[\w.]+)"""
_IF_EQ_RE = re.compile(
    r"\{\{#if \(eq\s+" + _OPERAND + r"\s+" + _OPERAND + r"\)\}\}(.*?)\{\{/if\}\}",
    re.S,
)
_IF_VAR_RE = re.compile(r"\{\{#if\s+([\w.]+)\s*\}\}(.*?)\{\{/if\}\}", re.S)
_IS_MATCH_RE = re.compile(
    r"\{\{#is_match\s+" + _OPERAND + r"\s+" + _OPERAND + r"\s*\}\}(.*?)\{\{/is_match\}\}",
    re.S,
)
_NOTIFY_RE = re.compile(
    r"\{\{\s*__hdx_notify_channel__\s+channel=(\"[^\"]*\"|'[^']*')"
    r"\s+id=(\"[^\"]*\"|'[^']*')\s*\}\}"
)

# Handlebars escapeExpression table (applied to {{var}} unless no_escape;
# {{{var}}} never escapes)
_HB_ESCAPES = {
    "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;",
    "'": "&#x27;", "`": "&#x60;", "=": "&#x3D;",
}


def _hb_escape(s: str) -> str:
    return re.sub(r"[&<>\"'`=]", lambda m: _HB_ESCAPES[m.group(0)], s)


def _get_path(view: dict, path: str):
    """lodash _.get over dotted paths; returns (value, found). A flat key
    containing dots wins over traversal (unflattenObject handles nesting
    upstream in the reference)."""
    if isinstance(view, dict) and path in view:
        return view[path], True
    cur = view
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None, False
    return cur, True


def _hb_str(v) -> str:
    """A view value the way Handlebars/JS prints it into text."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        from hyperdx_spark.jsnum import js_number_str

        return js_number_str(v)
    return str(v)


def _hb_truthy(v) -> bool:
    """Handlebars #if truthiness: false/0/''/null/undefined/[] are falsy.
    An empty OBJECT is truthy (Utils.isEmpty only special-cases arrays)."""
    if v is None or v is False:
        return False
    if isinstance(v, (int, float)) and not isinstance(v, bool) and v == 0:
        return False
    if isinstance(v, (str, list, tuple)) and len(v) == 0:
        return False
    return True


def _parse_operand(tok: str, view: dict):
    """(value, is_literal) for an eq/is_match argument — Handlebars parses
    quoted strings, numbers, and booleans as literals; bare words are
    view paths."""
    if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
        return tok[1:-1], True
    if tok == "true":
        return True, True
    if tok == "false":
        return False, True
    try:
        return (float(tok) if "." in tok else int(tok)), True
    except ValueError:
        pass
    v, _found = _get_path(view, tok)
    return v, False


def _strict_eq(a, b) -> bool:
    """JS === over the value kinds a template can produce: same-type
    comparisons only (number vs string is false), undefined === undefined
    is true."""
    if isinstance(a, bool) or isinstance(b, bool):
        return (a is True and b is True) or (a is False and b is False)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if a is None and b is None:
        return True
    return False


def _resolve_blocks(template: str, view: dict, *, render_is_match: bool) -> str:
    """Resolve the block helpers ({{#if (eq ..)}}, {{#if var}},
    {{#is_match}}) against the view, returning template text with only
    surviving branch bodies — shared by rendering AND notify extraction so
    a directive inside a falsy block never fires (Handlebars never
    executes helpers in unrendered branches)."""

    def cond_eq(m: re.Match) -> str:
        a, _al = _parse_operand(m.group(1), view)
        b, _bl = _parse_operand(m.group(2), view)
        parts = m.group(3).split("{{else}}", 1)
        return (
            parts[0]
            if _strict_eq(a, b)
            else (parts[1] if len(parts) > 1 else "")
        )

    def cond_var(m: re.Match) -> str:
        v, _found = _get_path(view, m.group(1))
        parts = m.group(2).split("{{else}}", 1)
        return (
            parts[0] if _hb_truthy(v) else (parts[1] if len(parts) > 1 else "")
        )

    def cond_is_match(m: re.Match) -> str:
        key = m.group(1).strip("'\"")
        target = m.group(2).strip("'\"")
        v, found = _get_path(view, key)
        hit = found and isinstance(v, str) and v == target
        # outer pass (render_is_match=False): matched bodies execute for
        # their notify side effects but render nothing (isMatchFn(false))
        return m.group(3) if (hit and render_is_match) else ""

    out = template
    for _ in range(8):  # sequential, non-nested blocks; few levels suffice
        nxt = _IF_EQ_RE.sub(cond_eq, out)
        nxt = _IS_MATCH_RE.sub(cond_is_match, nxt)
        nxt = _IF_VAR_RE.sub(cond_var, nxt)
        if nxt == out:
            break
        out = nxt
    return out


def render_template(
    template: str,
    view: dict,
    *,
    no_escape: bool = True,
    render_is_match: bool = True,
) -> str:
    """Handlebars-subset renderer covering exactly what the reference's
    alert templating registers (template.ts createHandlebarsWithHelpers +
    renderAlertTemplate): ``{{var}}`` / ``{{{var}}}`` substitution over
    dotted paths, ``{{#if (eq a b)}}..{{else}}..{{/if}}``,
    plain-truthiness ``{{#if var}}..{{/if}}``, ``{{#is_match "key"
    "value"}}..{{/is_match}}`` (strict-equality string match; the outer
    notify pass registers it non-rendering — template.ts:602-616), and
    ``{{__hdx_notify_channel__ ...}}`` rendering to nothing (helper returns
    null). ``no_escape=False`` applies Handlebars' escapeExpression to
    ``{{var}}`` (the title/body compiles omit noEscape; the generic-webhook
    body compile sets it).

    Substitution happens in ONE pass so spliced view values are never
    re-parsed as template syntax — the reference's untrusted-input
    guarantee (renderAlertTemplate.int.test.ts:250-292)."""
    out = _resolve_blocks(template, view, render_is_match=render_is_match)
    out = _NOTIFY_RE.sub("", out)

    # A block helper this subset doesn't understand must NOT fall through to
    # the plain-var pass (which would strip the markers and render both
    # branches unconditionally) — Handlebars would raise at compile time.
    leftover = re.search(r"\{\{[#/]\w+[^}]*\}\}", out)
    if leftover:
        raise ValueError(
            f"Unsupported Handlebars block in webhook template: {leftover.group(0)!r}"
        )

    def sub(m: re.Match) -> str:
        if m.group(1) is not None:  # {{{var}}} — never escaped
            v, _f = _get_path(view, m.group(1).strip())
            return _hb_str(v)
        key = m.group(2).strip()
        v, _f = _get_path(view, key)
        s = _hb_str(v)
        return s if no_escape else _hb_escape(s)

    # ONE combined pass: inserted values are never rescanned
    return re.sub(r"\{\{\{([^{}]+)\}\}\}|\{\{([^{}]+)\}\}", sub, out)


NOTIFY_FN_NAME = "__hdx_notify_channel__"


def get_default_external_action(
    channel_type: Optional[str], webhook_id: Optional[str]
) -> Optional[str]:
    """template.ts getDefaultExternalAction (:491-498): '@webhook-<id>' for
    a webhook channel with an id, else None."""
    if channel_type == "webhook" and webhook_id is not None:
        return f"@{channel_type}-{webhook_id}"
    return None


def translate_external_actions(template: str) -> str:
    """template.ts translateExternalActionsToInternal (:500-511):
    '@webhook-1234' -> '{{__hdx_notify_channel__ channel="webhook"
    id="1234"}}'. The id may itself be a template
    ('@webhook-{{attributes.webhookId}}'); only a single-space prefix is
    restored, exactly like the reference regex."""

    def repl(m: re.Match) -> str:
        prefix = " " if m.group(0).startswith(" ") else ""
        parts = m.group(1).split("-")
        channel, id_ = parts[0], "-".join(parts[1:])
        return f'{prefix}{{{{{NOTIFY_FN_NAME} channel="{channel}" id="{id_}"}}}}'

    return re.sub(r"(?:^|\s)@([a-zA-Z0-9.{}@_-]+)", repl, template)


def extract_notify_directives(
    template: str, view: Optional[dict] = None
) -> list:
    """The notifications a rendered template would FIRE: every
    '{{__hdx_notify_channel__ channel=".." id=".."}}' marker whose
    enclosing block helpers ({{#if}}, {{#if (eq ..)}}, {{#is_match}})
    all match the view — Handlebars never executes helpers inside an
    unrendered branch, so a directive a template conditioned away must
    not fire (template.ts:602-668). Each id is itself rendered against
    the view (it may be a template like '{{attributes.webhookId}}').
    Returns [(channel, rendered_id), ...]."""
    view = view or {}
    # matched is_match bodies DO fire their notifies (isMatchFn executes
    # options.fn even in the non-rendering outer pass)
    t = _resolve_blocks(template, view, render_is_match=True)
    out = []
    for m in _NOTIFY_RE.finditer(t):
        channel = m.group(1)[1:-1]
        id_tpl = m.group(2)[1:-1]
        out.append((channel, render_template(id_tpl, view)))
    return out


def find_webhook(id_or_name_prefix: str, webhooks_by_id: dict):
    """template.ts getPopulatedChannel (:513-545): resolve by id, else the
    first webhook whose NAME starts with the given string (insertion
    order), else the reference's user-facing error."""
    wh = webhooks_by_id.get(id_or_name_prefix)
    if wh is None:
        for w in webhooks_by_id.values():
            name = w.get("name", "") if isinstance(w, dict) else getattr(w, "name", "")
            if str(name).startswith(id_or_name_prefix):
                wh = w
                break
    if wh is None:
        raise KeyError(
            "Webhook not found. The webhook may have been deleted — update"
            " the alert's notification channel."
        )
    return wh


def alert_event_id(
    alert_id: str,
    channel_id: str,
    *,
    channel_type: str = "webhook",
    is_grouped: bool = False,
    group: Optional[str] = None,
) -> str:
    """Stable notification event id (template.ts:640-648: objectHash over
    alertId/channel/isGrouped[+groupId]); deterministic sha256 of the same
    fields in the same construction order."""
    import hashlib

    obj: dict = {
        "alertId": alert_id,
        "channel": {"type": channel_type, "id": channel_id},
        "isGrouped": is_grouped,
    }
    if is_grouped and group:
        obj["groupId"] = group
    canon = json.dumps(obj, sort_keys=False, separators=(",", ":"))
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def format_value_to_match_threshold(value: float, threshold: float) -> str:
    """template.ts formatValueToMatchThreshold (:193-215): the value is
    rendered with exactly the threshold's decimal places (threshold 1.5 ->
    one decimal; integer threshold -> rounded integer), round-half-away
    like Intl's default halfExpand."""
    from decimal import ROUND_HALF_UP, Decimal

    ts = _js_num_str(threshold)
    decimals = len(ts.split(".")[1]) if "." in ts else 0
    q = Decimal(1).scaleb(-decimals)
    d = Decimal(str(value)).quantize(q, rounding=ROUND_HALF_UP)
    return f"{d:.{decimals}f}" if decimals else str(int(d))


def _js_num_str(x) -> str:
    """A number as a JS template literal prints it (String(number) — no
    trailing .0, decimal band down to 1e-6, shortest-round-trip digits;
    shared emulation in jsnum.py). Python ints print exactly (they only
    arrive from engine-side counts)."""
    if isinstance(x, float):
        from hyperdx_spark.jsnum import js_number_str

        return js_number_str(x)
    return str(x)


def truncate_string(s: str, length: int) -> str:
    """api/src/utils/common.ts truncateString (:38-43): hard cut + '...'."""
    return s[:length] + "..." if len(s) > length else s


_MONTH_ABBR = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]


def format_date(
    dt, *, is_utc: bool = False, fmt: str = "normal", clock: str = "12h"
) -> str:
    """core/utils.ts formatDate (:600-617) with its TIME_TOKENS table
    (:577-598). Naive datetimes are treated as UTC when is_utc (the
    reference works in epoch instants)."""
    from datetime import timezone as _tz

    if is_utc:
        dt = (
            dt.astimezone(_tz.utc)
            if dt.tzinfo is not None
            else dt.replace(tzinfo=_tz.utc)
        )
    mon, day = _MONTH_ABBR[dt.month - 1], dt.day
    h12 = (dt.hour % 12) or 12
    ampm = "AM" if dt.hour < 12 else "PM"
    mm, ss = f"{dt.minute:02d}", f"{dt.second:02d}"
    hh = f"{dt.hour:02d}"
    ms3 = f"{dt.microsecond // 1000:03d}"
    table = {
        ("normal", "12h"): f"{mon} {day} {h12}:{mm}:{ss} {ampm}",
        ("normal", "24h"): f"{mon} {day} {hh}:{mm}:{ss}",
        ("short", "12h"): f"{mon} {day} {h12}:{mm}{ampm}",
        ("short", "24h"): f"{mon} {day} {hh}:{mm}",
        ("withMs", "12h"): f"{mon} {day} {h12}:{mm}:{ss}.{ms3} {ampm}",
        ("withMs", "24h"): f"{mon} {day} {hh}:{mm}:{ss}.{ms3}",
        ("withYear", "12h"): f"{mon} {day} {dt.year} {h12}:{mm}:{ss} {ampm}",
        ("withYear", "24h"): f"{mon} {day} {dt.year} {hh}:{mm}:{ss}",
        ("time", "12h"): f"{h12}:{mm}:{ss} {ampm}",
        ("time", "24h"): f"{hh}:{mm}:{ss}",
    }
    try:
        return table[(fmt, clock)]
    except KeyError:
        raise ValueError(f"unsupported format/clock: {fmt!r}/{clock!r}")


MAX_MESSAGE_LENGTH = 500   # template.ts:133 per-result-line cap
MAX_RESULTS_LENGTH = 2500  # template.ts:757 total sample cap


def time_range_message(start_time, end_time) -> str:
    """template.ts:671-675: half-open UTC window line."""
    return (
        f"Time Range (UTC): [{format_date(start_time, is_utc=True)}"
        f" - {format_date(end_time, is_utc=True)})"
    )


def _assemble_alert_body(
    *,
    cfg,
    state: str,
    value: float,
    start_time,
    end_time,
    source: str = "saved_search",
    group: Optional[str] = None,
    template: Optional[str] = None,
    default_external_action: Optional[str] = None,
    query_results: str = "",
    view: Optional[dict] = None,
) -> tuple[str, dict]:
    """renderAlertTemplate's body assembly (template.ts:669-763): the
    resolved / saved-search / tile raw bodies, '@'-action translation,
    per-line 500 + total 2500 sample truncation, and the single-pass
    Handlebars render that keeps untrusted group/sample values literal.
    The sample CSV itself comes from the caller (compile_chart_config +
    CSV render — the Spark side of the reference's ClickHouse fetch).

    ``source`` in {"saved_search", "tile"}; ``cfg`` an
    :class:`hyperdx_spark.alerts.AlertConfig`."""
    from hyperdx_spark.alerts import (
        describe_threshold,
        describe_threshold_resolution,
        describe_threshold_violation,
        does_exceed_threshold,
    )

    t = template or ""
    if default_external_action is not None:
        target = translate_external_actions(f"{t} {default_external_action}").strip()
    else:
        target = translate_external_actions(t)
    trange = time_range_message(start_time, end_time)

    if state == "OK":
        raw = (
            '{{#if group}}Group: "{{{group}}}" - {{/if}}'
            f"The alert has been resolved.\n{trange}\n{target}"
        )
        results = ""
    elif source == "saved_search":
        viol = describe_threshold_violation(cfg.threshold_type)
        raw = (
            '{{#if group}}Group: "{{{group}}}"{{/if}}\n'
            f"{_js_num_str(value)} lines found, which {viol} the threshold"
            f" of {describe_threshold(cfg)} lines\n{trange}\n{target}\n"
            "```\n{{{__hdx_query_results__}}}\n```"
        )
        lines = query_results.split("\n") if query_results else []
        results = truncate_string(
            "\n".join(truncate_string(ln, MAX_MESSAGE_LENGTH) for ln in lines),
            MAX_RESULTS_LENGTH,
        )
    elif source == "tile":
        fv = format_value_to_match_threshold(value, cfg.threshold)
        desc = (
            describe_threshold_violation(cfg.threshold_type)
            if does_exceed_threshold(cfg, value)
            else describe_threshold_resolution(cfg.threshold_type)
        )
        raw = (
            '{{#if group}}Group: "{{{group}}}"{{/if}}\n'
            f"{fv} {desc} {describe_threshold(cfg)}\n{trange}\n{target}"
        )
        results = ""
    else:
        raise ValueError(f"Unsupported alert source: {source!r}")

    full_view = {
        **(view or {}),
        "group": group,
        "value": value,
        "__hdx_query_results__": results,
    }
    return raw, full_view


def build_alert_body(**kwargs) -> str:
    """renderAlertTemplate's RETURNED body text (the outer Handlebars
    pass: is_match blocks execute for side effects but render nothing;
    notify markers render to nothing — template.ts:602-616, 765-768).
    See :func:`_assemble_alert_body` for the raw-template assembly and
    :func:`render_alert_notifications` for the full delivery flow."""
    raw, full_view = _assemble_alert_body(**kwargs)
    return render_template(
        raw, full_view, no_escape=False, render_is_match=False
    )


def render_alert_notifications(
    *,
    title: str,
    hdx_link: str = "",
    alert_id: str = "",
    is_grouped: bool = False,
    webhooks_by_id: Optional[dict] = None,
    channel_type: Optional[str] = None,
    webhook_id: Optional[str] = None,
    **body_kwargs,
) -> tuple[str, list]:
    """The full renderAlertTemplate notify flow (template.ts:556-768) as
    data: assemble the raw body ONCE (default '@'-action appended when the
    alert has a webhook channel), extract the directives that actually
    fire (block-gated), resolve each webhook by id-or-name-prefix, render
    the PER-CHANNEL body with the inner Handlebars pass (is_match bodies
    render — isMatchFn(true)), and build one ready-to-send request per
    directive with the reference's eventId and Idempotency-Key.

    Returns ``(rendered_text, requests)`` where ``rendered_text`` is the
    outer-pass render the reference returns to its caller and each request
    is ``(webhook, (url, headers, body))`` from
    :func:`build_webhook_request`. Unknown webhooks raise the reference's
    user-facing error. ``body_kwargs`` are :func:`build_alert_body`'s."""
    default_action = get_default_external_action(channel_type, webhook_id)
    raw, full_view = _assemble_alert_body(
        default_external_action=default_action, **body_kwargs
    )
    rendered = render_template(
        raw, full_view, no_escape=False, render_is_match=False
    )
    directives = extract_notify_directives(raw, full_view)
    if not directives:
        return rendered, []
    inner_body = render_template(
        raw, full_view, no_escape=False, render_is_match=True
    )
    state = body_kwargs.get("state", "ALERT")
    start_ms = _epoch_ms(body_kwargs["start_time"])
    end_ms = _epoch_ms(body_kwargs["end_time"])
    group = body_kwargs.get("group")
    requests = []
    for channel, id_or_prefix in directives:
        if channel != "webhook":
            raise ValueError(f"Unsupported alert destination: {channel!r}")
        wh = find_webhook(id_or_prefix, webhooks_by_id or {})
        wh_id = wh.get("id", id_or_prefix) if isinstance(wh, dict) else id_or_prefix
        event_id = alert_event_id(
            alert_id, str(wh_id), is_grouped=is_grouped, group=group
        )
        message = Message(
            title=title,
            body=inner_body,
            hdx_link=hdx_link,
            state=state,
            start_time=str(start_ms),
            end_time=str(end_ms),
            event_id=event_id,
        )
        service = (wh.get("service", "generic") if isinstance(wh, dict) else "generic")
        requests.append(
            (
                wh,
                build_webhook_request(
                    service,
                    wh.get("url", "") if isinstance(wh, dict) else "",
                    message,
                    body_template=wh.get("body") if isinstance(wh, dict) else None,
                    headers=wh.get("headers") if isinstance(wh, dict) else None,
                    query_params=wh.get("query_params") if isinstance(wh, dict) else None,
                ),
            )
        )
    return rendered, requests


def build_tile_title(
    tile_name: str,
    dashboard_name: str,
    cfg,
    value: float,
    state: str = "ALERT",
    template: Optional[str] = None,
    view: Optional[dict] = None,
) -> str:
    """buildAlertMessageTemplateTitle's TILE branch (template.ts:466-485):
    threshold-precision value + violation/resolution wording."""
    from hyperdx_spark.alerts import (
        describe_threshold,
        describe_threshold_resolution,
        describe_threshold_violation,
        does_exceed_threshold,
    )

    emoji = "✅ " if state == "OK" else "\U0001f6a8 "
    if template:
        return emoji + render_template(template, view or {}, no_escape=False)
    fv = format_value_to_match_threshold(value, cfg.threshold)
    desc = (
        describe_threshold_violation(cfg.threshold_type)
        if does_exceed_threshold(cfg, value)
        else describe_threshold_resolution(cfg.threshold_type)
    )
    return (
        f'{emoji}Alert for "{tile_name}" in "{dashboard_name}"'
        f" - {fv} {desc} {describe_threshold(cfg)}"
    )


def _epoch_ms(dt) -> int:
    # single naive-as-UTC rule: alerts._epoch
    from hyperdx_spark.alerts import _epoch

    return int(_epoch(dt) * 1000)


def build_log_search_link(
    frontend_url: str, saved_search_id: str, start_time, end_time
) -> str:
    """providers/default.ts buildLogSearchLink (:318-334)."""
    return (
        f"{frontend_url}/search/{saved_search_id}"
        f"?from={_epoch_ms(start_time)}&to={_epoch_ms(end_time)}&isLive=false"
    )


def build_chart_link(
    frontend_url: str,
    dashboard_id: str,
    granularity_seconds: int,
    start_time,
    end_time,
    tile_id: Optional[str] = None,
) -> str:
    """providers/default.ts buildChartLink (:336-362): range extended by
    7x granularity on both sides; granularity snapped to the
    convertMsToGranularityString ladder; tileId highlights."""
    from urllib.parse import quote

    from hyperdx_spark.granularity import convert_ms_to_granularity_string

    gms = granularity_seconds * 1000
    from_ = _epoch_ms(start_time) - gms * 7
    to = _epoch_ms(end_time) + gms * 7
    gran = quote(convert_ms_to_granularity_string(gms))
    url = (
        f"{frontend_url}/dashboards/{dashboard_id}"
        f"?from={from_}&granularity={gran}&to={to}"
    )
    if tile_id:
        url += f"&highlightedTileId={quote(str(tile_id))}"
    return url


def slack_payload(message: Message) -> dict:
    """handleSendSlackWebhook (template.ts:243-262)."""
    return {
        "text": message.title,
        "blocks": [
            {
                "type": "section",
                "text": {
                    "type": "mrkdwn",
                    "text": f"*<{message.hdx_link} | {message.title}>*\n{message.body}",
                },
            }
        ],
    }


def generic_payload(
    message: Message, body_template: Optional[str] = None
) -> str:
    """sendGenericWebhook body (template.ts:336-360): template rendered over
    the JSON-escaped view. An explicit "" template is honored; None gets the
    default."""
    template = (
        DEFAULT_GENERIC_WEBHOOK_BODY_TEMPLATE
        if body_template is None
        else body_template
    )
    view = {
        "body": escape_json_string(message.body),
        "endTime": message.end_time,
        "eventId": message.event_id,
        "link": escape_json_string(message.hdx_link),
        "startTime": message.start_time,
        "state": message.state,
        "title": escape_json_string(message.title),
    }
    return render_template(template, view)


def incidentio_payload(
    message: Message, body_template: Optional[str] = None
) -> str:
    """incident.io webhooks ride the generic-template path in the reference —
    ``WebhookService.IncidentIO`` is routed to ``handleSendGenericWebhook``
    (template.ts:225-235) and shares the same fallback body template
    (template.ts:136-141). The provider-specific parts are the delivery
    headers (see :func:`idempotency_key`), not the body shape."""
    return generic_payload(message, body_template)


def idempotency_key(message: Message) -> str:
    """Stable per-alert key for receivers that honour ``Idempotency-Key``
    (template.ts:356-363: ``objectHash({eventId, startTime, endTime,
    state})``). Deterministic sha256 over the same four fields in the same
    key order; delivery is at-least-once."""
    import hashlib

    canon = json.dumps(
        {
            "eventId": message.event_id,
            "startTime": message.start_time,
            "endTime": message.end_time,
            "state": message.state,
        },
        sort_keys=False,
        separators=(",", ":"),
    )
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()


def merge_query_params(url: str, query_params: Optional[dict]) -> str:
    """sendGenericWebhook URL assembly (template.ts:330-343): persisted
    queryParams are appended to whatever params the URL already carries."""
    if not query_params:
        return url
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    parts = urlsplit(url)
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    pairs.extend((k, str(v)) for k, v in query_params.items())
    return urlunsplit(parts._replace(query=urlencode(pairs)))


def build_webhook_request(
    service: str,
    url: str,
    message: Message,
    body_template: Optional[str] = None,
    headers: Optional[dict] = None,
    query_params: Optional[dict] = None,
) -> tuple:
    """One-stop request builder mirroring the reference's per-service switch
    (template.ts:225-243): returns ``(url, headers, body)`` ready for
    :func:`send_webhook`. ``service`` ∈ {"slack", "generic", "incidentio"}."""
    if service == "slack":
        return url, {"Content-Type": "application/json", **(headers or {})}, json.dumps(
            slack_payload(message)
        )
    if service in ("generic", "incidentio"):
        final_url = merge_query_params(url, query_params)
        hdrs = {
            "Content-Type": "application/json",
            **(headers or {}),
            "Idempotency-Key": idempotency_key(message),
        }
        return final_url, hdrs, generic_payload(message, body_template)
    raise ValueError(f"Unsupported webhook service: {service}")


def send_webhook(
    url: str,
    body: str,
    headers: Optional[dict] = None,
    timeout: float = 10.0,
) -> int:
    """Driver-side POST; redirects are refused (webhook SSRF rule,
    template.ts:377-385). Returns the HTTP status."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=body.encode("utf-8"),
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST",
    )

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):  # pragma: no cover - network
            raise RuntimeError("Webhook request was redirected, which is not allowed")

    opener = urllib.request.build_opener(_NoRedirect)
    with opener.open(req, timeout=timeout) as res:  # pragma: no cover - network
        return res.status
