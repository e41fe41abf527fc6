"""Alert evaluation (SURVEY §2.10).

Parity target: ``packages/api/src/tasks/checkAlerts/index.ts`` —
threshold operators (doesExceedThreshold :232-266), per-bucket/per-group
evaluation with worst-case-in-bucket (:1282-1310), empty-bucket zero
semantics (:1232-1280), M-consecutive-windows PENDING->ALERT promotion
(:1110-1131), OK auto-resolve (:1318-1343 and missing-group resolve
:1345-1380). Alert types/enums: ``common-utils/src/types.ts:584-649``.

Two surfaces:

* ``evaluate``: the reference's driver-side state machine over a chart
  query's result rows — scheduling and notification delivery stay external.
* ``backtest``: the same bucket/group/threshold/consecutive-window logic as
  ONE distributed DataFrame plan (lag-window streak counting) — evaluate an
  alert definition over months of history in a single pass, something the
  reference cannot do server-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from enum import Enum
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class ThresholdType(str, Enum):
    ABOVE = "above"                      # value >= threshold
    ABOVE_EXCLUSIVE = "above_exclusive"  # value > threshold
    BELOW = "below"                      # value < threshold
    BELOW_OR_EQUAL = "below_or_equal"    # value <= threshold
    EQUAL = "equal"
    NOT_EQUAL = "not_equal"
    BETWEEN = "between"
    NOT_BETWEEN = "not_between"


class AlertState(str, Enum):
    OK = "OK"
    PENDING = "PENDING"
    ALERT = "ALERT"
    INSUFFICIENT_DATA = "INSUFFICIENT_DATA"


@dataclass
class AlertConfig:
    threshold: float
    threshold_type: ThresholdType = ThresholdType.ABOVE
    threshold_max: Optional[float] = None
    window_minutes: int = 5            # granularity = alert interval
    num_consecutive_windows: int = 1   # M-of-M lookback
    # silencing (checkAlerts/index.ts:1050-1066): while now < silenced_until
    # the state machine still runs but notifications are suppressed —
    # silencing mutes the channel, it does not pause evaluation
    silenced_until: Optional[datetime] = None


def does_exceed_threshold(cfg: AlertConfig, value: float) -> bool:
    t, tmax = cfg.threshold, cfg.threshold_max
    tt = cfg.threshold_type
    if tt == ThresholdType.ABOVE:
        return value >= t
    if tt == ThresholdType.ABOVE_EXCLUSIVE:
        return value > t
    if tt == ThresholdType.BELOW:
        return value < t
    if tt == ThresholdType.BELOW_OR_EQUAL:
        return value <= t
    if tt == ThresholdType.EQUAL:
        return value == t
    if tt == ThresholdType.NOT_EQUAL:
        return value != t
    if tmax is None:
        raise ValueError(f"thresholdMax is required for {tt}")
    inside = t <= value <= tmax
    return inside if tt == ThresholdType.BETWEEN else not inside


_VIOLATION_TEXT = {
    ThresholdType.ABOVE: "meets or exceeds",
    ThresholdType.ABOVE_EXCLUSIVE: "exceeds",
    ThresholdType.BELOW: "falls below",
    ThresholdType.BELOW_OR_EQUAL: "falls to or below",
    ThresholdType.EQUAL: "equals",
    ThresholdType.NOT_EQUAL: "does not equal",
    ThresholdType.BETWEEN: "falls between",
    ThresholdType.NOT_BETWEEN: "falls outside",
}

_RESOLUTION_TEXT = {
    ThresholdType.ABOVE: "falls below",
    ThresholdType.ABOVE_EXCLUSIVE: "falls to or below",
    ThresholdType.BELOW: "meets or exceeds",
    ThresholdType.BELOW_OR_EQUAL: "exceeds",
    ThresholdType.EQUAL: "does not equal",
    ThresholdType.NOT_EQUAL: "equals",
    ThresholdType.BETWEEN: "falls outside",
    ThresholdType.NOT_BETWEEN: "falls between",
}


def describe_threshold_violation(tt: ThresholdType) -> str:
    """checkAlerts/template.ts describeThresholdViolation (:80-101)."""
    return _VIOLATION_TEXT[ThresholdType(tt)]


def describe_threshold_resolution(tt: ThresholdType) -> str:
    """checkAlerts/template.ts describeThresholdResolution (:104-125)."""
    return _RESOLUTION_TEXT[ThresholdType(tt)]


def _js_num(x) -> str:
    """A number the way a JS template literal prints it: no trailing .0
    (single implementation lives with the other template formatters)."""
    from hyperdx_spark.webhooks import _js_num_str

    return _js_num_str(x)


def describe_threshold(cfg: AlertConfig) -> str:
    """checkAlerts/template.ts describeThreshold (:127-131): range types
    render '<min> and <max>' ('?' when thresholdMax is unset)."""
    if cfg.threshold_type in (ThresholdType.BETWEEN, ThresholdType.NOT_BETWEEN):
        tmax = "?" if cfg.threshold_max is None else _js_num(cfg.threshold_max)
        return f"{_js_num(cfg.threshold)} and {tmax}"
    return _js_num(cfg.threshold)


def threshold_column(cfg: AlertConfig, value: Column) -> Column:
    """The same predicate as a Column expression (for distributed backtest)."""
    t = F.lit(cfg.threshold)
    tt = cfg.threshold_type
    if tt == ThresholdType.ABOVE:
        return value >= t
    if tt == ThresholdType.ABOVE_EXCLUSIVE:
        return value > t
    if tt == ThresholdType.BELOW:
        return value < t
    if tt == ThresholdType.BELOW_OR_EQUAL:
        return value <= t
    if tt == ThresholdType.EQUAL:
        return value == t
    if tt == ThresholdType.NOT_EQUAL:
        return value != t
    if cfg.threshold_max is None:
        raise ValueError(f"thresholdMax is required for {tt}")
    inside = (value >= t) & (value <= F.lit(cfg.threshold_max))
    return inside if tt == ThresholdType.BETWEEN else ~inside


@dataclass
class GroupHistory:
    state: AlertState = AlertState.OK
    counts: int = 0
    fired: bool = False
    last_values: list = field(default_factory=list)  # [(bucket_start, value)]


@dataclass
class Notification:
    state: AlertState
    group: str
    value: float
    bucket_start: datetime


def evaluate(
    rows: Sequence[dict],
    cfg: AlertConfig,
    *,
    date_range: tuple[datetime, datetime],
    ts_key: str = "__timestamp",
    value_key: str = "value",
    group_keys: Sequence[str] = (),
    previous: Optional[dict[str, GroupHistory]] = None,
    recent_states: Optional[dict[str, list[AlertState]]] = None,
    now: Optional[datetime] = None,
) -> tuple[dict[str, GroupHistory], list[Notification]]:
    """Driver-side state machine over one evaluation's query rows.

    ``rows``: collected chart rows (dicts). ``recent_states``: per group the
    previous windows' states newest-first (for M-consecutive promotion).
    Returns the new per-group histories and the notifications that fired.
    If the alert is silenced (cfg.silenced_until > ``now``), histories
    still advance but the returned notification list is empty — reference
    parity: silencing mutes the channel without pausing evaluation.
    """
    previous = previous or {}
    recent_states = recent_states or {}
    histories: dict[str, GroupHistory] = {}
    notifications: list[Notification] = []
    # one ALERT notification per group per RUN, carrying the LATEST breach
    # context — the reference overwrites latestAlertContext per bucket and
    # sends once in the transitions loop (checkAlerts/index.ts:1316-1324,
    # 1385-1407), never once per breaching bucket
    latest_ctx: dict[str, tuple[float, datetime]] = {}
    m = cfg.num_consecutive_windows

    def get_history(g: str) -> GroupHistory:
        return histories.setdefault(g, GroupHistory())

    def consecutive_ok(g: str) -> bool:
        if m <= 1:
            return True
        rel = (recent_states.get(g) or [])[: m - 1]
        return len(rel) == m - 1 and all(
            s in (AlertState.ALERT, AlertState.PENDING) for s in rel
        )

    # expected buckets over the evaluated range
    step = timedelta(minutes=cfg.window_minutes)
    buckets = []
    cur = date_range[0]
    while cur < date_range[1]:
        buckets.append(cur)
        cur += step

    by_bucket: dict[datetime, list[dict]] = {}
    for r in rows:
        by_bucket.setdefault(r[ts_key], []).append(r)

    has_group_by = bool(group_keys)
    has_alerts_in_previous = any(
        h.state in (AlertState.ALERT, AlertState.PENDING)
        for h in previous.values()
    )
    for bucket in buckets:
        data = by_bucket.get(bucket)
        if not data:
            # empty bucket == value 0 (zero-value alert / auto-resolve)
            if does_exceed_threshold(cfg, 0):
                h = get_history("")
                h.last_values.append((bucket, 0.0))
                h.counts += 1
                if consecutive_ok(""):
                    h.state = AlertState.ALERT
                    h.fired = True
                    latest_ctx[""] = (0.0, bucket)
                else:
                    h.state = AlertState.PENDING
                    h.fired = previous.get("", GroupHistory()).fired
            elif not has_group_by or not has_alerts_in_previous:
                # grouped alerts with previously-alerting groups defer to
                # the missing-group auto-resolve below (index.ts:1271-1276)
                get_history("").last_values.append((bucket, 0.0))
            continue
        # worst-case value per group within the bucket
        evaluations: dict[str, tuple[float, bool]] = {}
        for r in data:
            value = r.get(value_key)
            if value is None:
                continue
            g = ", ".join(f"{k}:{r[k]}" for k in group_keys) if has_group_by else ""
            exceeds = does_exceed_threshold(cfg, value)
            prev_eval = evaluations.get(g)
            if prev_eval is None or not prev_eval[1] or exceeds:
                evaluations[g] = (float(value), exceeds)
        for g, (value, exceeds) in evaluations.items():
            h = get_history(g)
            if exceeds:
                h.counts += 1
                if consecutive_ok(g):
                    h.state = AlertState.ALERT
                    h.fired = True
                    latest_ctx[g] = (value, bucket)
                else:
                    h.state = AlertState.PENDING
                    h.fired = previous.get(g, GroupHistory()).fired
            else:
                h.state = AlertState.OK
                h.counts = 0
            h.last_values.append((bucket, value))

    # missing groups (index.ts:1345-1370): a previously ALERT/PENDING group
    # absent from the current data gets an OK history (zero at the range
    # start) when a 0 value would resolve it — creation is NOT gated on
    # fired; only the notification below is
    if has_group_by and previous:
        for g, prev_h in previous.items():
            if (
                prev_h.state in (AlertState.ALERT, AlertState.PENDING)
                and g not in histories
                and not does_exceed_threshold(cfg, 0)
            ):
                h = get_history(g)
                h.last_values.append(
                    (buckets[0] if buckets else date_range[0], 0.0)
                )

    # no data and no previously-alerting groups: default OK history
    # (index.ts:1372-1375) — an ungrouped previous ALERT resolves through it
    if not histories:
        get_history("")

    # transitions (index.ts:1377-1407): ALERT sends with the latest context;
    # a run that breached then resolved ALSO sends the OK (mock previous
    # with fired=true); resolution requires previous fired !== false
    for g, h in histories.items():
        prev_h = previous.get(g)
        prev_state = prev_h.state if prev_h is not None else None
        prev_fired = prev_h.fired if prev_h is not None else None
        if g in latest_ctx:
            value, bucket = latest_ctx[g]
            notifications.append(Notification(AlertState.ALERT, g, value, bucket))
            prev_state, prev_fired = AlertState.ALERT, True
        if (
            prev_state in (AlertState.ALERT, AlertState.PENDING)
            and prev_fired is not False
            and h.state == AlertState.OK
        ):
            lv = h.last_values[-1] if h.last_values else None
            notifications.append(
                Notification(
                    AlertState.OK,
                    g,
                    lv[1] if lv else 0.0,
                    lv[0] if lv else date_range[1],
                )
            )
    if cfg.silenced_until is not None:
        if now is not None:
            ref_now = now
        elif cfg.silenced_until.tzinfo is not None:
            # aware silenced_until -> aware now (naive datetime.now() would
            # TypeError on comparison; local-time now would shift the
            # silence window by the host's UTC offset)
            from datetime import timezone

            ref_now = datetime.now(timezone.utc)
        else:
            # the module's convention is UTC-naive timestamps throughout
            from datetime import timezone

            ref_now = datetime.now(timezone.utc).replace(tzinfo=None)
        if cfg.silenced_until > ref_now:
            return histories, []  # muted channel; evaluation still advanced
    return histories, notifications


def backtest(
    df: DataFrame,
    cfg: AlertConfig,
    *,
    ts_col: str = "__timestamp",
    value_col: str = "value",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Distributed alert backtest: per (group, bucket) compute exceeds, the
    running exceed-streak, and the resulting state (ALERT once the streak
    reaches num_consecutive_windows, PENDING while shorter, OK otherwise) —
    one window pass, shuffles once on the group key.

    Scale note: an UNGROUPED backtest deliberately runs its streak window
    in one partition (Spark logs ``WindowExec: No Partition Defined``) —
    the streak is a sequential recurrence over ONE alert's time series,
    and the input here is the chart query's already-aggregated output
    (one row per bucket: years of minute buckets ≈ 10^6 rows), never raw
    events. Grouped backtests partition by the group key."""
    exceeds = threshold_column(cfg, F.col(value_col))
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(F.col(ts_col))
        if group_cols
        else Window.partitionBy(F.lit(1)).orderBy(F.col(ts_col))
    )
    d = df.withColumn("exceeds", exceeds)
    # streak of consecutive exceeding windows ending at this row: rows since
    # the last non-exceeding row (classic gaps-and-islands)
    grp = F.sum(F.when(~F.col("exceeds"), 1).otherwise(0)).over(w)
    d = d.withColumn("__grp", grp)
    streak_w = (
        Window.partitionBy(*[F.col(c) for c in group_cols], F.col("__grp")).orderBy(
            F.col(ts_col)
        )
        if group_cols
        else Window.partitionBy(F.col("__grp")).orderBy(F.col(ts_col))
    )
    # an island partition contains its leading non-exceeding row EXCEPT when
    # the island starts the series — offset row_number by whether the
    # partition's first row exceeds
    first_exceeds = F.first("exceeds").over(
        streak_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.when(first_exceeds, F.lit(0)).otherwise(F.lit(1))
    streak = F.when(
        F.col("exceeds"), F.row_number().over(streak_w) - offset
    ).otherwise(F.lit(0))
    m = cfg.num_consecutive_windows
    state = (
        F.when(~F.col("exceeds"), F.lit(AlertState.OK.value))
        .when(streak >= m, F.lit(AlertState.ALERT.value))
        .otherwise(F.lit(AlertState.PENDING.value))
    )
    return d.select(
        F.col(ts_col), *group_cols, F.col(value_col), F.col("exceeds"),
        streak.alias("streak"), state.alias("state"),
    )


def notification_messages(
    notifications: Sequence[Notification],
    *,
    search_name: str,
    link_base: str = "",
    granularity_seconds: int = 0,
) -> list:
    """Bridge evaluation output to webhook payload Messages
    (renderAlertTemplate, tasks/checkAlerts/template.ts:552+): one Message
    per fired notification with the state-appropriate title and the time
    window of the offending bucket."""
    from datetime import timedelta as _td

    from hyperdx_spark.webhooks import Message, build_title

    out = []
    for n in notifications:
        end = n.bucket_start + _td(seconds=granularity_seconds)
        out.append(
            Message(
                title=build_title(search_name, n.value, state=n.state.value),
                body=(
                    f"{n.value} events matched for group '{n.group}'"
                    if n.group
                    else f"{n.value} events matched"
                ),
                hdx_link=(
                    f"{link_base}?from={int(n.bucket_start.timestamp() * 1000)}"
                    f"&to={int(end.timestamp() * 1000)}"
                    if link_base
                    else ""
                ),
                state=n.state.value,
                start_time=n.bucket_start.isoformat(),
                end_time=end.isoformat(),
            )
        )
    return out


def _epoch(dt: datetime) -> float:
    """Epoch seconds, with NAIVE datetimes read as UTC — the reference works
    in epoch ms throughout (checkAlerts/index.ts, tasks/util.ts), so a naive
    caller in a non-UTC process zone must not shift the grid (r10 verdict
    finding #2). Aware datetimes are taken at face value."""
    from datetime import timezone as _tz

    if dt.tzinfo is None:
        return dt.replace(tzinfo=_tz.utc).timestamp()
    return dt.timestamp()


def _from_epoch(ts: float, *, like: datetime) -> datetime:
    """Inverse of :func:`_epoch`: naive-UTC out when *like* is naive."""
    from datetime import timezone as _tz

    if like.tzinfo is None:
        return datetime.fromtimestamp(ts, tz=_tz.utc).replace(tzinfo=None)
    return datetime.fromtimestamp(ts, tz=like.tzinfo)


def get_scheduled_window_start(
    now: datetime,
    window_size_mins: int,
    schedule_offset_mins: int = 0,
    schedule_start_at: Optional[datetime] = None,
) -> datetime:
    """The evaluation window a scheduled check at *now* covers
    (checkAlerts/index.ts:326-348): floor to the window grid, optionally
    shifted by ``schedule_offset_mins``; an explicit ``schedule_start_at``
    anchors the grid absolutely (seconds preserved) and takes priority
    over the offset."""
    step = window_size_mins * 60

    def _floor(ts: float) -> datetime:
        return _from_epoch(int(ts // step) * step, like=now)

    if schedule_start_at is not None:
        elapsed = max(0.0, _epoch(now) - _epoch(schedule_start_at))
        n = int(elapsed // step)
        return _from_epoch(_epoch(schedule_start_at) + n * step, like=now)
    if schedule_offset_mins <= 0:
        return _floor(_epoch(now))
    off = schedule_offset_mins * 60
    shifted = _floor(_epoch(now) - off)
    return _from_epoch(_epoch(shifted) + off, like=now)


MAX_BACKTEST_WINDOWS = 50          # tasks/util.ts:44
_MAX_LOOKBACK_HOURS = (6, 24)      # < 15-minute windows get 6h, else 24h


def calc_alert_date_range(
    start: datetime, end: datetime, window_size_mins: int
) -> tuple[datetime, datetime]:
    """Clamp an alert-history range (tasks/util.ts:47-85): at most 50
    windows and at most 6h (sub-15-minute windows) / 24h of lookback —
    evaluation cost stays bounded no matter how old the requested start."""
    start_s, end_s = _epoch(start), _epoch(end)
    step = window_size_mins * 60
    if (end_s - start_s) / step > MAX_BACKTEST_WINDOWS:
        start_s = end_s - MAX_BACKTEST_WINDOWS * step
    max_lookback = 3600 * (
        _MAX_LOOKBACK_HOURS[0] if window_size_mins < 15 else _MAX_LOOKBACK_HOURS[1]
    )
    if end_s - start_s > max_lookback:
        start_s = end_s - max_lookback
    return _from_epoch(start_s, like=start), end


def _parse_int(s: str):
    """JS parseInt: longest leading [+-]?digits prefix, NaN otherwise —
    '42.5' -> 42, 'abc' -> NaN; never raises."""
    import re as _re

    m = _re.match(r"\s*([+-]?\d+)", s)
    return int(m.group(1)) if m else float("nan")


def parse_alert_data(
    row,
    *,
    value_cols: "set[str]",
    timestamp_col: Optional[str] = None,
) -> tuple[Optional[float], list]:
    """(value, ordered [key, value] field pairs) from one result row
    (checkAlerts parseAlertData; spec checkAlerts.int.test.ts:972-1061):
    column order is preserved, the timestamp column (when the result is a
    time series) and the value columns are excluded from the fields, and
    field values are coerced to strings. The legacy group string is
    ``", ".join(f"{k}:{v}")`` over the pairs; attributes are
    ``dict(pairs)`` — values containing colons survive both."""
    mapping = row.asDict() if hasattr(row, "asDict") else dict(row)
    value = None
    extra = []
    for k, v in mapping.items():
        if k in value_cols:
            # the LAST value column wins (checkAlerts/index.ts:767-773
            # overwrites `value` per hit; pinned by the raw-SQL int test
            # 'alert is evaluated using the last numeric column'), and
            # stringified 64-bit ints parse back with parseInt semantics:
            # leading-integer prefix, NaN (not an exception) otherwise
            value = _parse_int(v) if isinstance(v, str) else v
            continue
        if timestamp_col is not None and k == timestamp_col:
            continue
        extra.append((k, str(v)))
    return value, extra


def get_response_metadata(df, *, display_type: str = "line", is_raw_sql: bool = False):
    """Result-shape inference (checkAlerts/index.ts:706-751
    getResponseMetadata): value columns = every numeric column; raw-SQL
    Number charts are ``single_value`` (no timestamp required, first row
    only); everything else is ``time_series`` keyed on the first
    Date-typed column. Returns ``None`` (the reference's logged-error
    degrade) when no value column — or, for time series, no timestamp
    column — exists.

    Takes the alert query's result DataFrame (schema only, nothing runs)."""
    from pyspark.sql import types as T

    value_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)
    }
    if not value_cols:
        return None
    if is_raw_sql and display_type == "number":
        return {"type": "single_value", "value_cols": value_cols,
                "timestamp_col": None}
    ts = next(
        (
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.TimestampType, T.DateType, T.TimestampNTZType))
        ),
        None,
    )
    if ts is None:
        return None
    return {"type": "time_series", "value_cols": value_cols, "timestamp_col": ts}


def parse_single_value(rows, meta) -> float:
    """Raw-SQL Number chart evaluation value (checkAlerts/index.ts:
    1162-1180): the FIRST row only, its last-numeric-column value, 0 when
    the result is empty or the value is null."""
    if not rows:
        return 0
    value, _extra = parse_alert_data(
        rows[0], value_cols=meta["value_cols"], timestamp_col=None
    )
    return 0 if value is None else value


ALERT_GROUP_DELIMITER = "||"  # checkAlerts/index.ts:483-488


def compute_history_map_key(alert_id: str, group_key: str = "") -> str:
    """checkAlerts/index.ts:486-488: 'alertId||group' for grouped alerts,
    the bare alertId otherwise ('||' is delimiter-safe for ObjectIds)."""
    return f"{alert_id}{ALERT_GROUP_DELIMITER}{group_key}" if group_key else alert_id


def extract_group_key_from_map_key(map_key: str, alert_id: str) -> str:
    """checkAlerts/index.ts:495-500: prefix-split so group names containing
    colons or delimiters survive."""
    prefix = alert_id + ALERT_GROUP_DELIMITER
    return map_key[len(prefix):] if map_key.startswith(prefix) else ""


def _history_created_at(history):
    if isinstance(history, dict):
        return history.get("created_at") or history.get("createdAt")
    return getattr(history, "created_at", None) or getattr(history, "createdAt", None)


def should_skip_alert_check(
    alert_id: str,
    previous_map: dict,
    *,
    has_group_by: bool,
    now_rounded: datetime,
) -> bool:
    """checkAlerts/index.ts:503-525: skip when ANY matching previous
    history was created in the current window — for grouped alerts any
    'alertId||*' key (or the bare alertId for the empty-group case)
    matches; non-grouped alerts match the exact alertId only. One group
    having current-window history skips the whole alert (pinned by the
    'skip if ONE group has history' int test)."""
    prefix = alert_id + ALERT_GROUP_DELIMITER
    for key, history in previous_map.items():
        matches = (
            (key == alert_id or key.startswith(prefix))
            if has_group_by
            else key == alert_id
        )
        created = _history_created_at(history)
        if matches and created is not None and _epoch(created) == _epoch(now_rounded):
            return True
    return False


def get_alert_evaluation_date_range(
    alert_id: str,
    previous_map: dict,
    *,
    has_group_by: bool,
    now_rounded: datetime,
    window_size_mins: int,
    schedule_start_at: Optional[datetime] = None,
) -> tuple[datetime, datetime]:
    """checkAlerts/index.ts:528-568: start from the latest previous
    evaluation (across all of a grouped alert's keys), else one window
    back; clamp to schedule_start_at when anchored; then the
    calc_alert_date_range 50-window/6h/24h caps."""
    prefix = alert_id + ALERT_GROUP_DELIMITER
    previous_created: Optional[datetime] = None
    if has_group_by:
        for key, history in previous_map.items():
            if key == alert_id or key.startswith(prefix):
                created = _history_created_at(history)
                if created is not None and (
                    previous_created is None or _epoch(created) > _epoch(previous_created)
                ):
                    previous_created = created
    else:
        h = previous_map.get(alert_id)
        previous_created = _history_created_at(h) if h is not None else None

    if previous_created is not None:
        raw_start = _epoch(previous_created)
    else:
        raw_start = _epoch(now_rounded) - window_size_mins * 60
    if schedule_start_at is not None:
        raw_start = max(raw_start, _epoch(schedule_start_at))
    return calc_alert_date_range(
        _from_epoch(raw_start, like=now_rounded), now_rounded, window_size_mins
    )


def alert_has_group_by(
    *,
    alert_group_by: Optional[str] = None,
    tile_group_by: "Optional[Sequence[str]]" = None,
    is_raw_sql: bool = False,
    display_type: str = "line",
) -> bool:
    """checkAlerts/index.ts:118-143 alertHasGroupBy: the alert's own
    groupBy wins; builder tiles check the tile config's; raw-SQL tiles
    can't be parsed reliably, so time-series display types are ASSUMED
    grouped and Number charts assumed not."""
    if alert_group_by:
        return True
    if is_raw_sql:
        return display_type != "number"
    return bool(tile_group_by)


def _lodash_set(obj: dict, path: list, value) -> None:
    if not path:
        return
    cur = obj
    for p in path[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        cur = nxt
    cur[path[-1]] = value


def unflatten_object(obj: dict, separator: str = ".", max_depth: int = 10) -> dict:
    """tasks/util.ts:7-26 unflattenObject: dotted attribute keys to a
    nested dict for the notification template view ({'a.b': 'c'} →
    {'a': {'b': 'c'}}). Lodash-set semantics: a later shorter key
    REPLACES the subtree; paths deeper than ``max_depth`` truncate with
    an empty-object leaf; any empty level ('foo..bar', leading/trailing
    separator) raises."""
    result: dict = {}
    for key, value in obj.items():
        keys = key.split(separator)
        if any(len(k) == 0 for k in keys):
            raise ValueError(f"Invalid key format: {key} contains empty level")
        within = len(keys) <= max_depth
        _lodash_set(
            result,
            keys if within else keys[:max_depth],
            value if within else {},
        )
    return result


def round_down_to(round_to_ms: int):
    """tasks/util.ts:28-37 roundDownTo/roundDownToXMinutes: floor a
    datetime to the interval grid (epoch ms); non-positive intervals
    raise."""
    if round_to_ms <= 0:
        raise ValueError("roundTo must be greater than zero")

    def f(dt: datetime) -> datetime:
        ms = int(_epoch(dt) * 1000)
        return _from_epoch((ms // round_to_ms) * round_to_ms / 1000, like=dt)

    return f


def round_down_to_x_minutes(x: int):
    """tasks/util.ts:40 roundDownToXMinutes."""
    return round_down_to(1000 * 60 * x)
