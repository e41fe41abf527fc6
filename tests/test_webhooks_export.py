"""Webhook payload builders (template.ts parity) + CSV export."""

import json

from hyperdx_spark.webhooks import (
    DEFAULT_GENERIC_WEBHOOK_BODY_TEMPLATE,
    Message,
    build_title,
    generic_payload,
    render_template,
    slack_payload,
)


def _msg(**kw):
    d = dict(
        title='Alert for "prod errors" - 42 lines found',
        body="error spike",
        hdx_link="https://app/search/abc?from=1&to=2",
        state="ALERT",
        start_time="2024-01-01T00:00:00Z",
        end_time="2024-01-01T00:05:00Z",
        event_id="evt-1",
    )
    d.update(kw)
    return Message(**d)


def test_slack_payload_shape():
    p = slack_payload(_msg())
    assert p["text"].startswith("Alert for")
    block = p["blocks"][0]
    assert block["type"] == "section"
    assert block["text"]["type"] == "mrkdwn"
    assert "https://app/search/abc" in block["text"]["text"]
    assert block["text"]["text"].startswith("*<")


def test_generic_payload_default_template_is_valid_json():
    body = generic_payload(_msg())
    doc = json.loads(body)
    assert "42 lines found" in doc["text"]
    assert "ALERT" in doc["text"]


def test_generic_payload_escapes_quotes_and_newlines():
    body = generic_payload(_msg(body='line1\nsaid "boom"', title='t"x'))
    doc = json.loads(body)  # must stay valid JSON after splicing
    assert 'said "boom"' in doc["text"]


def test_generic_payload_custom_and_empty_template():
    assert generic_payload(_msg(), body_template="") == ""
    out = generic_payload(_msg(), body_template='{"s": "{{state}}"}')
    assert json.loads(out) == {"s": "ALERT"}


def test_render_template_missing_key_empty():
    assert render_template("a {{x}} b", {}) == "a  b"


def test_build_title_emoji_by_state():
    assert build_title("s", 3, state="ALERT").startswith("\U0001f6a8 ")
    assert build_title("s", 3, state="OK").startswith("✅ ")
    t = build_title("s", 3, template="{{value}} hits", view={"value": 3})
    assert t.endswith("3 hits")


def test_default_template_matches_reference():
    assert DEFAULT_GENERIC_WEBHOOK_BODY_TEMPLATE.startswith('{"text"')


def test_export_csv_roundtrip(spark, sf_dir, tmp_path):
    from hyperdx_spark.io import export_csv, load_table

    df = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .limit(100)
    )
    # distributed write
    out_dir = str(tmp_path / "dist")
    export_csv(df, out_dir)
    back = spark.read.option("header", "true").csv(out_dir)
    assert back.count() == 100
    assert back.columns == ["event_id", "event_type", "value"]
    # single file through the driver
    out_file = str(tmp_path / "one.csv")
    export_csv(df, out_file, single_file=True)
    with open(out_file) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "event_id,event_type,value"
    assert len(lines) == 101


def test_template_eq_helper_conditional():
    """The reference registers exactly one Handlebars helper — eq — used
    as {{#if (eq state "ALERT")}} in webhook bodies (template.ts
    createHandlebarsWithHelpers). Both branches and the no-else form."""
    from hyperdx_spark.webhooks import render_template

    t = ('{"text": "{{#if (eq state "ALERT")}}FIRING: {{title}}'
         '{{else}}resolved: {{title}}{{/if}}"}')
    assert render_template(t, {"state": "ALERT", "title": "cpu"}) == \
        '{"text": "FIRING: cpu"}'
    assert render_template(t, {"state": "OK", "title": "cpu"}) == \
        '{"text": "resolved: cpu"}'
    no_else = '{{#if (eq state "OK")}}all clear{{/if}}-{{state}}'
    assert render_template(no_else, {"state": "OK"}) == "all clear-OK"
    assert render_template(no_else, {"state": "ALERT"}) == "-ALERT"


def test_template_eq_helper_dotted_path():
    """Dotted view keys work in eq conditionals (reference views carry
    nested paths); unmatched blocks must not render unconditionally."""
    from hyperdx_spark.webhooks import render_template

    t = '{{#if (eq alert.state "ALERT")}}secret{{/if}}'
    assert render_template(t, {"alert.state": "ALERT"}) == "secret"
    assert render_template(t, {"alert.state": "OK"}) == ""
    assert render_template(t, {}) == ""


def test_template_eq_single_quotes_and_var_operand():
    """ADVICE r4: Handlebars accepts single-quoted literals and variable
    operands in (eq a b); the old regex let those fall through to the
    plain-var pass, which stripped the block markers and rendered BOTH
    branches unconditionally."""
    t = "{{#if (eq state 'ALERT')}}F{{else}}R{{/if}}"
    assert render_template(t, {"state": "ALERT"}) == "F"
    assert render_template(t, {"state": "OK"}) == "R"
    # variable-vs-variable comparison
    tv = "{{#if (eq a b)}}same{{else}}diff{{/if}}"
    assert render_template(tv, {"a": "x", "b": "x"}) == "same"
    assert render_template(tv, {"a": "x", "b": "y"}) == "diff"


def test_template_unknown_block_raises():
    """An unsupported block helper must raise (as Handlebars.compile would),
    not silently strip the markers and leak the body."""
    import pytest

    with pytest.raises(ValueError, match="Unsupported Handlebars block"):
        render_template("{{#each items}}x{{/each}}", {"items": "z"})


def test_incidentio_payload_rides_generic_path():
    """incident.io service parity (template.ts:225-235): same body pipeline
    as generic, same fallback default template."""
    from hyperdx_spark.webhooks import incidentio_payload

    m = _msg()
    assert incidentio_payload(m) == generic_payload(m)
    out = incidentio_payload(m, body_template='{"s": "{{state}}"}')
    assert json.loads(out) == {"s": "ALERT"}


def test_build_webhook_request_per_service():
    """build_webhook_request mirrors the reference switch: slack gets the
    block payload; generic/incidentio get the template body plus a stable
    Idempotency-Key and merged query params (template.ts:330-363)."""
    from hyperdx_spark.webhooks import build_webhook_request, idempotency_key

    m = _msg()
    url, hdrs, body = build_webhook_request("slack", "https://h/x", m)
    assert json.loads(body)["blocks"][0]["type"] == "section"
    assert "Idempotency-Key" not in hdrs

    url, hdrs, body = build_webhook_request(
        "incidentio",
        "https://h/x?a=1",
        m,
        query_params={"b": "2"},
        headers={"X-Custom": "v"},
    )
    assert url == "https://h/x?a=1&b=2"
    assert hdrs["X-Custom"] == "v"
    assert hdrs["Idempotency-Key"] == idempotency_key(m)
    # key is stable and depends only on the four reference fields
    assert idempotency_key(_msg(body="different body")) == idempotency_key(m)
    assert idempotency_key(_msg(state="OK")) != idempotency_key(m)
    assert json.loads(body)["text"].startswith('Alert for "prod errors"')

    import pytest

    with pytest.raises(ValueError):
        build_webhook_request("pagerduty", "https://h/x", m)
