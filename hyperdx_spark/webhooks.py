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
        base = render_template(template, view or {})
    else:
        base = f'Alert for "{name}" - {value} lines found'
    return emoji + base


def render_template(template: str, view: dict) -> str:
    """Minimal Handlebars-subset renderer: ``{{var}}`` substitution plus the
    one helper the reference registers — ``{{#if (eq a b)}} ... {{else}} ...
    {{/if}}`` (template.ts createHandlebarsWithHelpers:
    ``hb.registerHelper('eq', (a, b) => a === b)``). Each ``eq`` operand is
    a single- or double-quoted literal or a view path. Non-nested blocks
    only; the reference compiles with noEscape over a pre-escaped view."""

    def operand(tok: str) -> str:
        if len(tok) >= 2 and tok[0] == tok[-1] and tok[0] in "'\"":
            return tok[1:-1]
        v = view.get(tok, "")
        return "" if v is None else str(v)

    def cond(m: re.Match) -> str:
        a, b, body = m.group(1), m.group(2), m.group(3)
        parts = body.split("{{else}}", 1)
        hit = operand(a) == operand(b)
        return parts[0] if hit else (parts[1] if len(parts) > 1 else "")

    _OPERAND = r"""('[^']*'|"[^"]*"|[\w.]+)"""
    out = re.sub(
        r"\{\{#if \(eq\s+" + _OPERAND + r"\s+" + _OPERAND + r"\)\}\}(.*?)\{\{/if\}\}",
        cond,
        template,
        flags=re.S,
    )

    # A block helper this subset doesn't understand must NOT fall through to
    # the plain-var pass (which would strip the markers and render both
    # branches unconditionally) — Handlebars would raise at compile time.
    leftover = re.search(r"\{\{[#/]\w+[^}]*\}\}", out)
    if leftover:
        raise ValueError(
            f"Unsupported Handlebars block in webhook template: {leftover.group(0)!r}"
        )

    def sub(m: re.Match) -> str:
        key = m.group(1).strip()
        v = view.get(key, "")
        return "" if v is None else str(v)

    return re.sub(r"\{\{([^}]+)\}\}", sub, out)


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
