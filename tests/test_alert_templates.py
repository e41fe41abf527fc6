"""Alert notification-template twins.

Ports the reference's renderAlertTemplate / buildAlertMessageTemplateTitle
pinned snapshots (api/src/tasks/checkAlerts/__tests__/
renderAlertTemplate.int.test.ts + its .snap) and the template.ts helper
surface: threshold wording, value-to-threshold precision, '@'-action
translation, notify-directive extraction with is_match gating, webhook
resolution, provider links, and the UTC time-range line.
"""

from datetime import datetime, timezone

import pytest

from hyperdx_spark.alerts import (
    AlertConfig,
    ThresholdType,
    calc_alert_date_range,
    describe_threshold,
    describe_threshold_resolution,
    describe_threshold_violation,
    get_scheduled_window_start,
)
from hyperdx_spark.webhooks import (
    alert_event_id,
    build_alert_body,
    build_chart_link,
    build_log_search_link,
    build_tile_title,
    build_title,
    extract_notify_directives,
    find_webhook,
    format_date,
    format_value_to_match_threshold,
    get_default_external_action,
    render_template,
    time_range_message,
    translate_external_actions,
    truncate_string,
)

START = datetime(2023, 3, 17, 22, 10, tzinfo=timezone.utc)
END = datetime(2023, 3, 17, 22, 15, tzinfo=timezone.utc)
TRANGE = "Time Range (UTC): [Mar 17 10:10:00 PM - Mar 17 10:15:00 PM)"

SAMPLE_CSV = "\n".join(
    [
        '"2023-03-17 22:14:01","error","Failed to connect to database"',
        '"2023-03-17 22:13:45","error","Connection timeout after 30s"',
        '"2023-03-17 22:12:30","error","Retry limit exceeded"',
    ]
)

# (thresholdType, threshold, thresholdMax, alertValue, okValue) — the
# int-test's alertCases table
CASES = [
    (ThresholdType.ABOVE, 5, None, 10, 3),
    (ThresholdType.ABOVE_EXCLUSIVE, 5, None, 10, 3),
    (ThresholdType.BELOW, 5, None, 2, 10),
    (ThresholdType.BELOW_OR_EQUAL, 5, None, 3, 10),
    (ThresholdType.EQUAL, 5, None, 5, 10),
    (ThresholdType.NOT_EQUAL, 5, None, 10, 5),
    (ThresholdType.BETWEEN, 5, 7, 6, 10),
    (ThresholdType.NOT_BETWEEN, 5, 7, 12, 6),
]

# describeThresholdViolation / describeThresholdResolution snapshots
VIOLATION = {
    ThresholdType.ABOVE: "meets or exceeds",
    ThresholdType.ABOVE_EXCLUSIVE: "exceeds",
    ThresholdType.BELOW: "falls below",
    ThresholdType.BELOW_OR_EQUAL: "falls to or below",
    ThresholdType.EQUAL: "equals",
    ThresholdType.NOT_EQUAL: "does not equal",
    ThresholdType.BETWEEN: "falls between",
    ThresholdType.NOT_BETWEEN: "falls outside",
}
RESOLUTION = {
    ThresholdType.ABOVE: "falls below",
    ThresholdType.ABOVE_EXCLUSIVE: "falls to or below",
    ThresholdType.BELOW: "meets or exceeds",
    ThresholdType.BELOW_OR_EQUAL: "exceeds",
    ThresholdType.EQUAL: "does not equal",
    ThresholdType.NOT_EQUAL: "equals",
    ThresholdType.BETWEEN: "falls outside",
    ThresholdType.NOT_BETWEEN: "falls between",
}


def _cfg(tt, threshold=5, tmax=None):
    return AlertConfig(
        threshold=threshold, threshold_type=tt, threshold_max=tmax
    )


def test_threshold_wording_tables():
    for tt in ThresholdType:
        assert describe_threshold_violation(tt) == VIOLATION[tt]
        assert describe_threshold_resolution(tt) == RESOLUTION[tt]
    assert describe_threshold(_cfg(ThresholdType.BETWEEN, 5, 7)) == "5 and 7"
    assert describe_threshold(_cfg(ThresholdType.BETWEEN, 5)) == "5 and ?"
    assert describe_threshold(_cfg(ThresholdType.ABOVE, 5.0)) == "5"
    assert describe_threshold(_cfg(ThresholdType.ABOVE, 1.5)) == "1.5"


# ---- buildAlertMessageTemplateTitle snapshots --------------------------------


@pytest.mark.parametrize("tt,th,tmax,av,ok", CASES)
def test_title_saved_search_snapshots(tt, th, tmax, av, ok):
    assert (
        build_title("My Search", av, state="ALERT")
        == f'\U0001f6a8 Alert for "My Search" - {av} lines found'
    )
    assert (
        build_title("My Search", ok, state="OK")
        == f'✅ Alert for "My Search" - {ok} lines found'
    )


TILE_TITLE_SNAPSHOTS_ALERT = {
    ThresholdType.ABOVE: "10 meets or exceeds 5",
    ThresholdType.ABOVE_EXCLUSIVE: "10 exceeds 5",
    ThresholdType.BELOW: "2 falls below 5",
    ThresholdType.BELOW_OR_EQUAL: "3 falls to or below 5",
    ThresholdType.EQUAL: "5 equals 5",
    ThresholdType.NOT_EQUAL: "10 does not equal 5",
    ThresholdType.BETWEEN: "6 falls between 5 and 7",
    ThresholdType.NOT_BETWEEN: "12 falls outside 5 and 7",
}
TILE_TITLE_SNAPSHOTS_OK = {
    ThresholdType.ABOVE: "3 falls below 5",
    ThresholdType.ABOVE_EXCLUSIVE: "3 falls to or below 5",
    ThresholdType.BELOW: "10 meets or exceeds 5",
    ThresholdType.BELOW_OR_EQUAL: "10 exceeds 5",
    ThresholdType.EQUAL: "10 does not equal 5",
    ThresholdType.NOT_EQUAL: "5 equals 5",
    ThresholdType.BETWEEN: "10 falls outside 5 and 7",
    ThresholdType.NOT_BETWEEN: "6 falls between 5 and 7",
}


@pytest.mark.parametrize("tt,th,tmax,av,ok", CASES)
def test_title_tile_snapshots(tt, th, tmax, av, ok):
    cfg = _cfg(tt, th, tmax)
    got = build_tile_title("Test Chart", "My Dashboard", cfg, av, state="ALERT")
    assert got == (
        f'\U0001f6a8 Alert for "Test Chart" in "My Dashboard"'
        f" - {TILE_TITLE_SNAPSHOTS_ALERT[tt]}"
    )
    got = build_tile_title("Test Chart", "My Dashboard", cfg, ok, state="OK")
    assert got == (
        f'✅ Alert for "Test Chart" in "My Dashboard"'
        f" - {TILE_TITLE_SNAPSHOTS_OK[tt]}"
    )


def test_title_tile_decimal_and_integer_threshold_snapshots():
    cfg = _cfg(ThresholdType.ABOVE, 1.5)
    assert build_tile_title("Test Chart", "My Dashboard", cfg, 10.123) == (
        '\U0001f6a8 Alert for "Test Chart" in "My Dashboard"'
        " - 10.1 meets or exceeds 1.5"
    )
    cfg = _cfg(ThresholdType.ABOVE, 5)
    assert build_tile_title("Test Chart", "My Dashboard", cfg, 10.789) == (
        '\U0001f6a8 Alert for "Test Chart" in "My Dashboard"'
        " - 11 meets or exceeds 5"
    )


def test_format_value_to_match_threshold():
    assert format_value_to_match_threshold(10.123, 1.5) == "10.1"
    assert format_value_to_match_threshold(10.789, 5) == "11"
    assert format_value_to_match_threshold(10, 1.5) == "10.0"
    assert format_value_to_match_threshold(10, 0.25) == "10.00"
    # halfExpand: ties round away from zero, unlike binary round-half-even
    assert format_value_to_match_threshold(2.5, 1) == "3"


# ---- renderAlertTemplate body snapshots --------------------------------------


def _body(state, source, tt=ThresholdType.ABOVE, th=5, tmax=None, value=10,
          group=None, query_results=""):
    return build_alert_body(
        cfg=_cfg(tt, th, tmax), state=state, value=value,
        start_time=START, end_time=END, source=source, group=group,
        query_results=query_results,
    )


def test_body_saved_search_alert_snapshot():
    got = _body("ALERT", "saved_search", query_results=SAMPLE_CSV)
    assert got == (
        "\n10 lines found, which meets or exceeds the threshold of 5 lines\n"
        f"{TRANGE}\n\n```\n{SAMPLE_CSV}\n```"
    )


@pytest.mark.parametrize("tt,th,tmax,av,ok", CASES)
def test_body_saved_search_all_threshold_types(tt, th, tmax, av, ok):
    got = _body("ALERT", "saved_search", tt, th, tmax, value=av)
    lines_word = describe_threshold(_cfg(tt, th, tmax))
    assert got.startswith(
        f"\n{av} lines found, which {VIOLATION[tt]} the threshold"
        f" of {lines_word} lines\n{TRANGE}"
    )


def test_body_saved_search_with_group_snapshot():
    got = _body("ALERT", "saved_search", group="http")
    assert got == (
        'Group: "http"\n'
        "10 lines found, which meets or exceeds the threshold of 5 lines\n"
        f"{TRANGE}\n\n```\n\n```"
    )


def test_body_resolved_snapshots():
    assert _body("OK", "saved_search", value=3) == (
        f"The alert has been resolved.\n{TRANGE}\n"
    )
    assert _body("OK", "saved_search", value=3, group="http") == (
        f'Group: "http" - The alert has been resolved.\n{TRANGE}\n'
    )
    # tile alerts share the resolved body
    assert _body("OK", "tile", value=3, group="us-east-1") == (
        f'Group: "us-east-1" - The alert has been resolved.\n{TRANGE}\n'
    )


def test_body_tile_snapshots():
    assert _body("ALERT", "tile") == f"\n10 meets or exceeds 5\n{TRANGE}\n"
    assert _body("ALERT", "tile", group="us-east-1") == (
        f'Group: "us-east-1"\n10 meets or exceeds 5\n{TRANGE}\n'
    )
    got = _body("ALERT", "tile", th=1.5, value=10.123)
    assert got == f"\n10.1 meets or exceeds 1.5\n{TRANGE}\n"
    got = _body("ALERT", "tile", th=5, value=10.789)
    assert got == f"\n11 meets or exceeds 5\n{TRANGE}\n"


def test_body_untrusted_handlebars_stays_literal():
    """renderAlertTemplate.int.test.ts:250-292: Handlebars syntax in query
    results and group values is spliced as data, never parsed."""
    payload = "{{ __hdx_notify_channel__ channel='email' id='attacker@example.com' }}"
    malicious_csv = "\n".join(
        [
            f'"2023-03-17 22:14:01","error","{payload}"',
            '"2023-03-17 22:13:45","error","{{value}}"',
        ]
    )
    got = _body("ALERT", "saved_search", query_results=malicious_csv)
    assert payload in got
    assert "{{value}}" in got
    assert '"error","10"' not in got

    got = _body("ALERT", "saved_search", group=payload)
    assert f'Group: "{payload}"' in got


def test_body_sample_truncation_caps():
    long_line = "x" * 600
    got = _body("ALERT", "saved_search", query_results=long_line)
    assert "x" * 500 + "..." in got
    many = "\n".join("y" * 100 for _ in range(40))
    got = _body("ALERT", "saved_search", query_results=many)
    block = got.split("```")[1]
    assert block.strip().endswith("...") and len(block) <= 2510


def test_body_external_action_is_stripped_from_render():
    got = build_alert_body(
        cfg=_cfg(ThresholdType.ABOVE), state="ALERT", value=10,
        start_time=START, end_time=END, source="tile",
        template="ping @webhook-abc123",
        default_external_action=get_default_external_action("webhook", "zzz"),
    )
    # the notify markers render to nothing; surrounding text survives
    assert "@webhook" not in got and "__hdx_notify_channel__" not in got
    assert "ping" in got


# ---- external-action translation + notify extraction -------------------------


def test_translate_external_actions_reference_examples():
    assert translate_external_actions("@webhook-1234_5678") == (
        '{{__hdx_notify_channel__ channel="webhook" id="1234_5678"}}'
    )
    assert translate_external_actions(
        "fire @webhook-{{attributes.webhookId}}"
    ) == (
        'fire {{__hdx_notify_channel__ channel="webhook"'
        ' id="{{attributes.webhookId}}"}}'
    )
    # multi-dash ids keep their tail; emails survive the charset
    assert translate_external_actions("@webhook-a-b-c") == (
        '{{__hdx_notify_channel__ channel="webhook" id="a-b-c"}}'
    )
    # non-@ text untouched
    assert translate_external_actions("no actions here") == "no actions here"


def test_get_default_external_action():
    assert get_default_external_action("webhook", "w1") == "@webhook-w1"
    assert get_default_external_action("webhook", None) is None
    assert get_default_external_action(None, "w1") is None


def test_extract_notify_directives_with_is_match_gating():
    t = translate_external_actions(
        "@webhook-base"
        ' {{#is_match "attributes.region" "us-east-1"}} @webhook-regional'
        " {{/is_match}}"
    )
    hits = extract_notify_directives(
        t, {"attributes": {"region": "us-east-1"}}
    )
    assert hits == [("webhook", "base"), ("webhook", "regional")]
    miss = extract_notify_directives(t, {"attributes": {"region": "eu-1"}})
    assert miss == [("webhook", "base")]


def test_extract_notify_directives_renders_id_templates():
    t = translate_external_actions("@webhook-{{attributes.webhookId}}")
    hits = extract_notify_directives(t, {"attributes": {"webhookId": "w42"}})
    assert hits == [("webhook", "w42")]


def test_find_webhook_by_id_then_name_prefix():
    whs = {
        "id1": {"name": "alerts-prod"},
        "id2": {"name": "alerts-staging"},
    }
    assert find_webhook("id2", whs)["name"] == "alerts-staging"
    assert find_webhook("alerts-s", whs)["name"] == "alerts-staging"
    assert find_webhook("alerts", whs)["name"] == "alerts-prod"  # first wins
    with pytest.raises(KeyError, match="Webhook not found"):
        find_webhook("nope", whs)


def test_alert_event_id_grouping_fields():
    a = alert_event_id("al1", "ch1")
    b = alert_event_id("al1", "ch1", is_grouped=True, group="g1")
    c = alert_event_id("al1", "ch1", is_grouped=True, group="g2")
    assert a != b != c and a == alert_event_id("al1", "ch1")


# ---- render_template block semantics -----------------------------------------


def test_plain_if_block_truthiness():
    t = '{{#if group}}Group: "{{{group}}}"{{/if}}done'
    assert render_template(t, {"group": "http"}) == 'Group: "http"done'
    assert render_template(t, {"group": ""}) == "done"
    assert render_template(t, {}) == "done"
    t2 = "{{#if n}}yes{{else}}no{{/if}}"
    assert render_template(t2, {"n": 0}) == "no"
    assert render_template(t2, {"n": 3}) == "yes"
    assert render_template(t2, {"n": []}) == "no"


def test_triple_stash_never_escapes_double_does():
    t = "{{{raw}}} vs {{esc}}"
    out = render_template(
        t, {"raw": "<b>&</b>", "esc": "<b>&</b>"}, no_escape=False
    )
    assert out == "<b>&</b> vs &lt;b&gt;&amp;&lt;/b&gt;"
    # noEscape mode (generic webhook body) leaves both verbatim
    out = render_template(t, {"raw": "<x>", "esc": "<x>"}, no_escape=True)
    assert out == "<x> vs <x>"


def test_is_match_render_variants():
    t = '{{#is_match "k" "v"}}BODY{{/is_match}}rest'
    assert render_template(t, {"k": "v"}) == "BODYrest"
    assert render_template(t, {"k": "other"}) == "rest"
    # strict ===: a non-string view value never matches a string literal
    assert render_template(t, {"k": 5}) == "rest"
    # outer pass: matched blocks render nothing (isMatchFn(false))
    assert render_template(t, {"k": "v"}, render_is_match=False) == "rest"


def test_eq_numeric_and_boolean_literals():
    """Handlebars parses bare numbers/booleans in subexpressions as
    literals with JS === semantics: number matches number, never string."""
    t = "{{#if (eq count 5)}}high{{else}}low{{/if}}"
    assert render_template(t, {"count": 5}) == "high"
    assert render_template(t, {"count": 5.0}) == "high"
    assert render_template(t, {"count": "5"}) == "low"  # string !== number
    assert render_template(t, {}) == "low"
    t2 = "{{#if (eq ok true)}}y{{else}}n{{/if}}"
    assert render_template(t2, {"ok": True}) == "y"
    assert render_template(t2, {"ok": 1}) == "n"  # 1 !== true under ===


def test_empty_dict_is_truthy_in_if():
    # Handlebars Utils.isEmpty only special-cases ARRAYS; {} is truthy
    t = "{{#if attributes}}has{{else}}none{{/if}}"
    assert render_template(t, {"attributes": {}}) == "has"
    assert render_template(t, {"attributes": []}) == "none"


def test_extract_notify_directives_respects_if_blocks():
    """A notify directive inside a falsy {{#if}} (or non-matching eq)
    block must NOT fire — Handlebars never executes helpers in an
    unrendered branch."""
    t = translate_external_actions("{{#if group}} @webhook-grouped {{/if}}")
    assert extract_notify_directives(t, {"group": "http"}) == [
        ("webhook", "grouped")
    ]
    assert extract_notify_directives(t, {"group": None}) == []
    t2 = translate_external_actions(
        '{{#if (eq state "ALERT")}} @webhook-firing {{/if}}'
    )
    assert extract_notify_directives(t2, {"state": "ALERT"}) == [
        ("webhook", "firing")
    ]
    assert extract_notify_directives(t2, {"state": "OK"}) == []


def test_dotted_path_substitution():
    assert (
        render_template("{{attributes.pod}}", {"attributes": {"pod": "p1"}})
        == "p1"
    )
    assert render_template("{{a.b.c}}", {}) == ""


# ---- time-range line, formatDate, links --------------------------------------


def test_time_range_message_snapshot():
    assert time_range_message(START, END) == TRANGE


def test_format_date_tokens():
    d = datetime(2023, 3, 7, 14, 5, 9, 123000, tzinfo=timezone.utc)
    assert format_date(d, is_utc=True) == "Mar 7 2:05:09 PM"
    assert format_date(d, is_utc=True, clock="24h") == "Mar 7 14:05:09"
    assert format_date(d, is_utc=True, fmt="short") == "Mar 7 2:05PM"
    assert format_date(d, is_utc=True, fmt="withMs") == "Mar 7 2:05:09.123 PM"
    assert (
        format_date(d, is_utc=True, fmt="withYear") == "Mar 7 2023 2:05:09 PM"
    )
    assert format_date(d, is_utc=True, fmt="time") == "2:05:09 PM"
    # midnight + noon 12h edges
    m = datetime(2023, 3, 7, 0, 0, 0, tzinfo=timezone.utc)
    assert format_date(m, is_utc=True, fmt="time") == "12:00:00 AM"
    n = datetime(2023, 3, 7, 12, 0, 0, tzinfo=timezone.utc)
    assert format_date(n, is_utc=True, fmt="time") == "12:00:00 PM"
    with pytest.raises(ValueError):
        format_date(d, fmt="nope")


def test_truncate_string():
    assert truncate_string("abc", 5) == "abc"
    assert truncate_string("abcdef", 3) == "abc..."


def test_provider_links():
    assert build_log_search_link("https://app", "ss1", START, END) == (
        "https://app/search/ss1?from=1679091000000&to=1679091300000"
        "&isLive=false"
    )
    # 5-minute granularity: range extended by 7x300s each side
    url = build_chart_link("https://app", "d1", 300, START, END, tile_id="t1")
    assert url == (
        "https://app/dashboards/d1?from=1679088900000&granularity=5%20minute"
        "&to=1679093400000&highlightedTileId=t1"
    )


def test_convert_ms_to_granularity_string_ladder():
    from hyperdx_spark.granularity import convert_ms_to_granularity_string

    assert convert_ms_to_granularity_string(1000) == "30 second"
    assert convert_ms_to_granularity_string(30_000) == "30 second"
    assert convert_ms_to_granularity_string(30_001) == "1 minute"
    assert convert_ms_to_granularity_string(300_000) == "5 minute"
    assert convert_ms_to_granularity_string(301_000) == "10 minute"
    assert convert_ms_to_granularity_string(900_000) == "15 minute"
    assert convert_ms_to_granularity_string(86_400_000) == "1 day"
    assert convert_ms_to_granularity_string(10**12) == "30 day"


# ---- scheduler helpers: naive datetimes read as UTC ---------------------------


def test_scheduler_helpers_naive_means_utc(monkeypatch):
    """r10 verdict finding #2: a naive datetime must be interpreted as UTC
    regardless of the process zone — pin by faking a non-UTC TZ."""
    import os
    import time

    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        naive = datetime(2024, 1, 1, 10, 7)
        got = get_scheduled_window_start(naive, 15)
        assert got == datetime(2024, 1, 1, 10, 0)
        aware = naive.replace(tzinfo=timezone.utc)
        assert (
            get_scheduled_window_start(aware, 15).timestamp()
            == got.replace(tzinfo=timezone.utc).timestamp()
        )
        s, e = calc_alert_date_range(
            datetime(2023, 1, 1), datetime(2024, 1, 1, 12), 60
        )
        assert e == datetime(2024, 1, 1, 12)
        assert s == datetime(2023, 12, 31, 12)  # 24h lookback clamp
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_render_alert_notifications_end_to_end():
    """renderAlertTemplate's full notify flow (template.ts:556-768): the
    default '@webhook-<id>' action fires against the resolved webhook, the
    channel body comes from the INNER render (is_match bodies render),
    block-gated directives stay silent, and the request carries the
    idempotency header + a stable event id."""
    import json

    from hyperdx_spark.webhooks import render_alert_notifications

    whs = {
        "w1": {"id": "w1", "name": "alerts-prod", "service": "generic",
               "url": "https://hooks.example.com/a"},
        "w2": {"id": "w2", "name": "alerts-regional", "service": "slack",
               "url": "https://hooks.example.com/b"},
    }
    cfg = _cfg(ThresholdType.ABOVE, 5)
    common = dict(
        cfg=cfg, state="ALERT", value=10, start_time=START, end_time=END,
        source="saved_search", title="Test Alert Title",
        hdx_link="https://app/search/x", alert_id="a1",
        webhooks_by_id=whs,
    )

    rendered, reqs = render_alert_notifications(
        channel_type="webhook", webhook_id="w1", **common
    )
    # outer render: the notify marker is gone from the returned text
    assert "__hdx_notify_channel__" not in rendered and "@webhook" not in rendered
    assert len(reqs) == 1
    wh, (url, headers, body) = reqs[0]
    assert wh["id"] == "w1" and url == "https://hooks.example.com/a"
    assert "Idempotency-Key" in headers
    doc = json.loads(body)  # default generic template is valid JSON
    assert "10 lines found" in doc["text"]  # {"text": "{{title}} | {{body}} | ..."}
    # deterministic event id: same inputs -> same id (via the same header)
    _r2, reqs2 = render_alert_notifications(
        channel_type="webhook", webhook_id="w1", **common
    )
    assert reqs2[0][1][1]["Idempotency-Key"] == headers["Idempotency-Key"]

    # custom template: name-prefix resolution + is_match gating; the
    # matched block's notify fires, the unmatched one does not
    rendered, reqs = render_alert_notifications(
        template=(
            '{{#is_match "group" "http"}} @webhook-alerts-reg {{/is_match}}'
            '{{#is_match "group" "grpc"}} @webhook-alerts-prod {{/is_match}}'
        ),
        group="http",
        **common,
    )
    assert [r[0]["id"] for r in reqs] == ["w2"]  # name prefix 'alerts-reg'
    assert reqs[0][1][2]  # slack request body built

    # no channel, no actions -> text only
    rendered, reqs = render_alert_notifications(**common)
    assert reqs == [] and "10 lines found" in rendered

    # unknown webhook -> the reference's user-facing error
    with pytest.raises(KeyError, match="Webhook not found"):
        render_alert_notifications(
            channel_type="webhook", webhook_id="missing", **common
        )
