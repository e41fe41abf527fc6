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
    one helper the reference registers — ``{{#if (eq var "val")}} ...
    {{else}} ... {{/if}}`` (template.ts createHandlebarsWithHelpers:
    ``hb.registerHelper('eq', (a, b) => a === b)``). Non-nested blocks
    only; the reference compiles with noEscape over a pre-escaped view."""

    def cond(m: re.Match) -> str:
        var, val, body = m.group(1), m.group(2), m.group(3)
        parts = body.split("{{else}}", 1)
        hit = str(view.get(var, "")) == val
        return parts[0] if hit else (parts[1] if len(parts) > 1 else "")

    # [\w.]+ so dotted view paths don't fall through to the generic pass —
    # which would strip the {{#if}}/{{/if}} markers as unknown vars and
    # render the conditional body UNCONDITIONALLY
    out = re.sub(
        r'\{\{#if \(eq\s+([\w.]+)\s+"([^"]*)"\)\}\}(.*?)\{\{/if\}\}',
        cond,
        template,
        flags=re.S,
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
