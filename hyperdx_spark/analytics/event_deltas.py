"""Event deltas — rank properties by how differently their values are
distributed between a target (outlier) and baseline (inlier) group.

Parity target: ``packages/common-utils/src/core/eventDeltas.ts`` —
property statistics (:62-109), comparison score = max normalized-percentage
delta with the single-group fallback (:228-265), +0.1 semantic boost for
well-known OTel attributes (:268-293), high-cardinality hiding
(uniqueness > 0.9 over > 20 samples, :186-221), Id-suffix denylist (:141-158).

The reference collects 500-5000 sampled rows and computes the statistics
client-side. Here the whole computation is a DataFrame plan over *all* rows
(or a sampled subset the caller prepares): one explode + two aggregations,
grouped by (property, value) — at 100 TB only the per-key-value count table
(bounded by the attribute-value domain, not by row count) crosses a shuffle.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIN_PROPERTY_OCCURRENCES = 5   # eventDeltas.ts:60
# eventDeltas.ts:299-302 sampling configuration
SAMPLE_SIZE = 1000
MIN_SAMPLE_SIZE = 500
MAX_SAMPLE_SIZE = 5000
SAMPLE_RATIO = 0.01
HIGH_CARDINALITY_UNIQUENESS = 0.9
HIGH_CARDINALITY_MIN_SAMPLES = 20

BOOSTED_ATTRIBUTE_SUFFIXES = [
    "service.name", "http.method", "http.request.method", "http.status_code",
    "http.response.status_code", "error", "error.type",
    "deployment.environment", "deployment.environment.name", "rpc.method",
    "rpc.service", "db.system", "db.operation", "messaging.system",
    "messaging.operation",
]

_ID_SUFFIX = re.compile(r"(Id|ID)$")


def flatten_data(data: dict) -> dict:
    """Flatten a nested row object into dot-path keys, arrays with bracket
    notation (``arr[0]``), preserving empty objects/arrays as sentinel
    entries (eventDeltas.ts:23-44) — the shape the property statistics and
    the ``properties`` map column expect."""
    result: dict = {}

    def recurse(cur, prop: str) -> None:
        if isinstance(cur, list):
            for i, item in enumerate(cur):
                recurse(item, f"{prop}[{i}]")
            if not cur:
                result[prop] = []
        elif isinstance(cur, dict):
            if not cur and prop:
                result[prop] = {}
            for k, v in cur.items():
                recurse(v, f"{prop}.{k}" if prop else k)
        else:
            result[prop] = cur

    recurse(data, "")
    return result


def strip_type_wrappers(type_str: str) -> str:
    """Strip LowCardinality(...)/Nullable(...) wrappers from a ClickHouse
    type string (eventDeltas.ts:116-130)."""
    t = type_str.strip()
    changed = True
    while changed:
        changed = False
        for w in ("LowCardinality(", "Nullable("):
            if t.startswith(w) and t.endswith(")"):
                t = t[len(w):-1].strip()
                changed = True
    return t


def get_base_column_name(key: str) -> Optional[str]:
    """Physical column behind a flattened key: ``Events.Timestamp[0]`` ->
    ``Events.Timestamp``; ``None`` for deeper paths after array indices
    (eventDeltas.ts:137-140)."""
    m = re.match(r"^([^\[]+)\[(\d+)\]$", key)
    if m:
        return m.group(1)
    return None if "[" in key else key


def is_id_field(key: str, column_meta: list) -> bool:
    """Top-level String columns or Array(String) elements ending in Id/ID
    (eventDeltas.ts:143-159). *column_meta*: [(name, ch_type), ...] or
    [{"name":..., "type":...}, ...]."""
    col_name = get_base_column_name(key)
    if not col_name or not _ID_SUFFIX.search(col_name):
        return False
    t = _meta_type(col_name, column_meta)
    if t is None:
        return False
    base = strip_type_wrappers(t)
    if base == "String":
        return True
    if base.startswith("Array("):
        return strip_type_wrappers(base[len("Array("):-1]) == "String"
    return False


def is_timestamp_array_field(key: str, column_meta: list) -> bool:
    """Per-index timestamp array elements — ``Events.Timestamp[N]`` of an
    ``Array(DateTime64)`` column (eventDeltas.ts:161-175)."""
    col_name = get_base_column_name(key)
    if not col_name:
        return False
    t = _meta_type(col_name, column_meta)
    if t is None:
        return False
    base = strip_type_wrappers(t)
    if not base.startswith("Array("):
        return False
    return strip_type_wrappers(base[len("Array("):-1]).startswith("DateTime64(")


def is_denylisted(key: str, column_meta: list) -> bool:
    """Hide-by-default fields: IDs + per-index timestamps
    (eventDeltas.ts:177-183)."""
    return is_id_field(key, column_meta) or is_timestamp_array_field(key, column_meta)


def is_high_cardinality(
    key: str,
    outlier_value_occurrences: dict,
    inlier_value_occurrences: dict,
    outlier_property_occurrences: dict,
    inlier_property_occurrences: dict,
) -> bool:
    """Pure-function twin of eventDeltas.ts:189-223 isHighCardinality (the
    distributed :func:`rank_properties` expression implements the same
    rule JVM-side): a field is hidden when the MIN of the two groups'
    uniqueness (unique values / occurrences) exceeds 0.9 over > 20
    combined samples; a group with no data defers to the other, and a
    field absent from both is never hidden. The value-occurrence dicts
    map key -> {value: count}; the property-occurrence dicts map
    key -> total occurrences."""
    outlier_total = outlier_property_occurrences.get(key, 0)
    inlier_total = inlier_property_occurrences.get(key, 0)
    if outlier_total + inlier_total <= HIGH_CARDINALITY_MIN_SAMPLES:
        return False
    out_unique = len(outlier_value_occurrences.get(key, ()))
    in_unique = len(inlier_value_occurrences.get(key, ()))
    out_u = out_unique / outlier_total if outlier_total > 0 else None
    in_u = in_unique / inlier_total if inlier_total > 0 else None
    if out_u is not None and in_u is not None:
        effective = min(out_u, in_u)
    elif out_u is not None:
        effective = out_u
    elif in_u is not None:
        effective = in_u
    else:
        return False
    return effective > HIGH_CARDINALITY_UNIQUENESS


def _meta_type(col_name: str, column_meta: list) -> Optional[str]:
    for c in column_meta:
        name = c["name"] if isinstance(c, dict) else c[0]
        if name == col_name:
            return c["type"] if isinstance(c, dict) else c[1]
    return None


def _js_value_str(v) -> str:
    """JS ``String(value)`` for the flattened leaf values
    getPropertyStatistics stringifies (eventDeltas.ts:89-91): null/undefined
    -> '' (special-cased upstream), numbers via the shared
    shortest-round-trip digits, booleans lowercase, arrays join to '' when
    empty, plain objects -> '[object Object]'."""
    from hyperdx_spark.jsnum import js_number_str

    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_str(float(v))
    if isinstance(v, dict):
        return "[object Object]"
    if isinstance(v, list):
        return ",".join(_js_value_str(x) for x in v)
    return str(v)


def get_property_statistics(rows: list) -> dict:
    """Pure twin of eventDeltas.ts:62-114 getPropertyStatistics (the MCP
    server runs this same algorithm driver-side; :func:`rank_properties`
    is the distributed form): flatten every row, count per-key occurrences,
    and keep per-value counts/percentages only for keys reaching
    MIN_PROPERTY_OCCURENCES — the SECOND pass recounts all rows, so a
    common key's value counts include the pre-threshold occurrences.

    Returns ``{"percentage_occurrences", "property_occurrences",
    "value_occurrences"}`` with dict-of-dict shapes mirroring the Maps."""
    flattened = [flatten_data(r) for r in rows]
    property_occurrences: dict[str, int] = {}
    common: set[str] = set()
    for item in flattened:
        for key in item:
            n = property_occurrences.get(key, 0) + 1
            property_occurrences[key] = n
            if n >= MIN_PROPERTY_OCCURRENCES:
                common.add(key)
    value_occurrences: dict[str, dict[str, int]] = {}
    for item in flattened:
        for key, value in item.items():
            if key in common:
                vs = _js_value_str(value)
                m = value_occurrences.setdefault(key, {})
                m[vs] = m.get(vs, 0) + 1
    percentage_occurrences = {
        prop: {
            v: c / property_occurrences.get(prop, 1) * 100
            for v, c in values.items()
        }
        for prop, values in value_occurrences.items()
    }
    return {
        "percentage_occurrences": percentage_occurrences,
        "property_occurrences": property_occurrences,
        "value_occurrences": value_occurrences,
    }


def rank_properties_rows(
    target_rows: list, baseline_rows: list, column_meta: list
) -> dict:
    """Pure twin of eventDeltas.ts:354-409 rankProperties — the driver-side
    composition over already-collected row samples (the distributed
    :func:`rank_properties` computes the same ranking JVM-side from a
    DataFrame). Returns ``{"ranked", "target_stats", "baseline_stats"}``;
    each ranked entry carries key/score/base_score/semantic_boost/hidden/
    hidden_reason with the boost applied only when the base score is
    positive."""
    target_stats = get_property_statistics(target_rows)
    baseline_stats = get_property_statistics(baseline_rows)
    keys = set(target_stats["value_occurrences"]) | set(
        baseline_stats["value_occurrences"]
    )
    ranked = []
    for key in keys:
        tvals = target_stats["value_occurrences"].get(key, {})
        bvals = baseline_stats["value_occurrences"].get(key, {})
        base_score = compute_comparison_score(tvals, bvals)
        boost = semantic_boost(key) if base_score > 0 else 0
        hidden_reason = None
        if is_denylisted(key, column_meta):
            hidden_reason = "denylist"
        elif is_high_cardinality(
            key,
            target_stats["value_occurrences"],
            baseline_stats["value_occurrences"],
            target_stats["property_occurrences"],
            baseline_stats["property_occurrences"],
        ):
            hidden_reason = "high_cardinality"
        ranked.append(
            {
                "key": key,
                "score": base_score + boost * 0.1,
                "base_score": base_score,
                "semantic_boost": boost,
                "hidden": hidden_reason is not None,
                "hidden_reason": hidden_reason,
            }
        )
    ranked.sort(key=lambda p: -p["score"])
    return {
        "ranked": ranked,
        "target_stats": target_stats,
        "baseline_stats": baseline_stats,
    }


# ChartUtils.tsx:273-380 isAggregateFunction's function list (ClickHouse
# aggregate names; matching is case-insensitive substring of 'name(')
_AGGREGATE_FN_NAMES = [
    "count", "countIf", "countDistinct", "sum", "sumIf", "avg", "avgIf",
    "min", "max", "any", "anyLast", "groupArray", "groupArrayInsertAt",
    "groupArrayMovingAvg", "groupArraySample", "groupUniqArray",
    "groupUniqArrayIf", "groupArrayIntersect", "groupArrayIntersectIf",
    "groupArrayReduce", "groupBitmap", "groupBitmapIf", "groupBitmapOr",
    "groupBitmapXor",
    "quantile", "quantileIf", "quantileExact", "quantileExactWeighted",
    "quantileTiming", "quantileTimingWeighted", "quantileTDigest",
    "quantileTDigestWeighted", "quantileBFloat16",
    "quantileBFloat16Weighted", "quantiles", "median", "medianExact",
    "medianTDigest", "medianBFloat16",
    "stddevPop", "stddevPopIf", "stddevSamp", "stddevSampIf", "varPop",
    "varPopIf", "varSamp", "varSampIf", "covarPop", "covarSamp", "corr",
    "uniq", "uniqExact", "uniqCombined", "uniqCombined64", "uniqHLL12",
    "uniqTheta",
    "groupBitAnd", "groupBitOr", "groupBitXor",
    "groupArrayMap", "groupArrayTuple", "groupArraySorted", "topK",
    "topKIf", "topKWeighted",
    "argMin", "argMax", "minMap", "maxMap",
    "runningDifference", "retention", "sequenceCount", "sequenceMatch",
    "histogram", "simpleLinearRegression", "stochasticLinearRegression",
    "categoricalInformationValue", "sumMap", "sumMapFiltered",
    "sumWithOverflow", "entropy", "skewPop", "skewSamp", "kurtPop",
    "kurtSamp",
]


def is_aggregate_function(value: str) -> bool:
    """ChartUtils.tsx:273-380 isAggregateFunction twin: does the expression
    contain a known ClickHouse aggregate call? Case-insensitive substring
    of ``name(`` — the reference's exact (permissive) rule."""
    lower = value.lower()
    return any(fn.lower() + "(" in lower for fn in _AGGREGATE_FN_NAMES)


def selection_split_condition(
    timestamp_expr: str,
    value_expr: str,
    box: tuple,
    *,
    is_outlier: bool,
    is_aggregate: Optional[bool] = None,
) -> str:
    """The heatmap-selection SQL condition DBDeltaChart builds for its
    outlier/inlier queries (DBDeltaChart.tsx:129-196 buildSqlCondition):
    ``box`` is (x_min, x_max, y_min, y_max). Non-aggregate value
    expressions filter on timestamp AND value directly; aggregate ones
    filter on the timestamp range only (the y-range is applied as a HAVING
    over per-timestamp groups — see :func:`delta_selection_split`); the
    inlier side is the outer negation of the SAME condition so the two
    sets partition the data exactly."""
    x_min, x_max, y_min, y_max = box
    if is_aggregate is None:
        is_aggregate = is_aggregate_function(value_expr)
    ts_cond = f"{timestamp_expr} >= {x_min} AND {timestamp_expr} <= {x_max}"
    if is_aggregate:
        cond = ts_cond
    else:
        cond = (
            f"({value_expr}) >= {y_min} AND ({value_expr}) <= {y_max}"
            f" AND {ts_cond}"
        )
    return cond if is_outlier else f"NOT ({cond})"


def has_heatmap_selection(x_min, x_max, y_min, y_max) -> bool:
    """DBDeltaChart.tsx:68-70: a selection exists only when ALL FOUR
    coordinates are set — partial-null coordinates mean distribution mode
    (one all-spans query, no outlier/inlier split)."""
    return (
        x_min is not None and x_max is not None
        and y_min is not None and y_max is not None
    )


def delta_selection_split(
    df: DataFrame,
    *,
    timestamp_expr: str,
    value_expr: str,
    box: tuple,
    id_col: Optional[str] = None,
    sample_size: int = SAMPLE_SIZE,
):
    """Engine-side twin of DBDeltaChart's outlier/inlier query pair
    (DBDeltaChart.tsx:89-245): given a heatmap selection box
    (x = timestamp range as unix seconds, y = value range), return
    (outlier_df, inlier_df) — rows inside vs outside the box, each
    stable-sampled to ``sample_size`` (the reference's PartIds CTE +
    ``indexHint((_part, _part_offset) IN PartIds)`` is a ClickHouse part-
    pruning device for the same sample; Spark's analogue is the pushed
    filter itself + the hash-ordered LIMIT of :func:`stable_sample`).

    Aggregate ``value_expr`` (per isAggregateFunction) switches to the
    AggregatedTimestamps plan: timestamps whose in-x-range aggregate lands
    inside the y-range (GROUP BY timestamp HAVING value BETWEEN y) select
    the outliers via IN, the inliers via NOT-between AND NOT IN — a
    broadcast semi/anti join here, bounded by the distinct timestamps
    inside the box."""
    from hyperdx_spark.functions.chcompat import translate_expr

    x_min, x_max, y_min, y_max = box
    ts = F.expr(translate_expr(timestamp_expr))
    is_agg = is_aggregate_function(value_expr)
    ts_in_x = (ts >= F.lit(x_min)) & (ts <= F.lit(x_max))
    if not is_agg:
        val = F.expr(translate_expr(value_expr))
        cond = (val >= F.lit(y_min)) & (val <= F.lit(y_max)) & ts_in_x
        outlier, inlier = df.where(cond), df.where(~cond)
    else:
        agg = F.expr(translate_expr(value_expr))
        agg_ts = (
            df.where(ts_in_x)
            .groupBy(ts.alias("__sel_ts"))
            .agg(agg.alias("__sel_v"))
            .where(
                (F.col("__sel_v") >= F.lit(y_min))
                & (F.col("__sel_v") <= F.lit(y_max))
            )
            .select("__sel_ts")
        )
        keyed = df.withColumn("__sel_ts", ts)
        outlier = keyed.where(ts_in_x).join(
            F.broadcast(agg_ts), on="__sel_ts", how="left_semi"
        )
        inlier = keyed.where(~ts_in_x).join(
            F.broadcast(agg_ts), on="__sel_ts", how="left_anti"
        )
        outlier, inlier = outlier.drop("__sel_ts"), inlier.drop("__sel_ts")
    def sample(d: DataFrame) -> DataFrame:
        # the reference's PartIds CTE is a FIXED LIMIT SAMPLE_SIZE ordered
        # by the stable hash (no effective-size clamp there)
        key = F.xxhash64(F.col(id_col)) if id_col else F.rand(42)
        return d.orderBy(key).limit(sample_size)

    return sample(outlier), sample(inlier)


def semantic_boost(key: str) -> int:
    lk = key.lower()
    return int(any(lk == s or lk.endswith("." + s) for s in BOOSTED_ATTRIBUTE_SUFFIXES))


def _boost_col(key: Column) -> Column:
    lk = F.lower(key)
    cond = F.lit(False)
    for s in BOOSTED_ATTRIBUTE_SUFFIXES:
        cond = cond | (lk == s) | lk.endswith("." + s)
    return cond.cast("int")


def rank_properties(
    df: DataFrame,
    *,
    target: Column,
    properties: Column,
    min_property_occurrences: int = MIN_PROPERTY_OCCURRENCES,
    hide_id_keys: bool = True,
) -> DataFrame:
    """Distributed property ranking.

    ``target``: boolean column splitting rows into target (true) vs baseline.
    ``properties``: ``map<string,string>`` of flattened dot-path properties.

    Returns (key, base_score, boost, score, hidden, hidden_reason) sorted by
    score descending. Scores are percentages in [0, 100(+0.1 boost)] exactly
    as the reference computes them.
    """
    kv = df.select(
        target.alias("__t"), F.explode(properties).alias("__k", "__v")
    ).select("__t", "__k", F.coalesce(F.col("__v"), F.lit("")).alias("__v"))

    # per (group, key): rows containing the key; a key only gets value
    # statistics within a group where it is "common" (>= 5 rows in THAT
    # group, eventDeltas.ts:62-77) — a key common in one group only is
    # scored via the single-group fallback
    prop_occ = kv.groupBy("__t", "__k").agg(F.count("*").alias("__n"))
    common_g = prop_occ.where(
        F.col("__n") >= min_property_occurrences
    ).select("__t", "__k")
    val_occ = (
        kv.join(F.broadcast(common_g), on=["__t", "__k"])
        .groupBy("__t", "__k", "__v")
        .agg(F.count("*").alias("__c"))
    )
    # pivot the two groups side by side per (key, value)
    sides = (
        val_occ.groupBy("__k", "__v")
        .agg(
            F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(0)).alias("tc"),
            F.sum(F.when(~F.col("__t"), F.col("__c")).otherwise(0)).alias("bc"),
        )
    )
    wk = Window.partitionBy("__k")
    sides = sides.withColumn("tsum", F.sum("tc").over(wk)).withColumn(
        "bsum", F.sum("bc").over(wk)
    )
    both = (F.col("tsum") > 0) & (F.col("bsum") > 0)
    delta = F.abs(
        F.col("tc") / F.col("tsum") * 100 - F.col("bc") / F.col("bsum") * 100
    )
    # single-group fallback (eventDeltas.ts:243-253): score = max normalized
    # pct of the present group, but 0 when it has <= 1 distinct value
    present_cnt = F.when(F.col("tsum") > 0, F.col("tc")).otherwise(F.col("bc"))
    present_sum = F.when(F.col("tsum") > 0, F.col("tsum")).otherwise(F.col("bsum"))
    single = present_cnt / present_sum * 100

    scored = sides.groupBy("__k").agg(
        F.max(F.when(both, delta).otherwise(single)).alias("__raw"),
        F.count("*").alias("__n_values"),
        F.sum(F.when(F.col("tc") > 0, 1).otherwise(0)).alias("__t_uniq"),
        F.sum(F.when(F.col("bc") > 0, 1).otherwise(0)).alias("__b_uniq"),
        F.max("tsum").alias("__t_total"),
        F.max("bsum").alias("__b_total"),
    )
    base_score = F.when(
        (F.col("__t_total") > 0) & (F.col("__b_total") > 0), F.col("__raw")
    ).otherwise(F.when(F.col("__n_values") > 1, F.col("__raw")).otherwise(F.lit(0.0)))
    scored = scored.withColumn("base_score", base_score)

    boost = F.when(F.col("base_score") > 0, _boost_col(F.col("__k"))).otherwise(0)
    scored = scored.withColumn("boost", boost).withColumn(
        "score", F.col("base_score") + F.col("boost") * 0.1
    )

    # high cardinality: min per-group uniqueness > 0.9 with > 20 samples
    t_u = F.when(F.col("__t_total") > 0, F.col("__t_uniq") / F.col("__t_total"))
    b_u = F.when(F.col("__b_total") > 0, F.col("__b_uniq") / F.col("__b_total"))
    eff = F.coalesce(F.least(t_u, b_u), t_u, b_u)
    high_card = (
        (F.col("__t_total") + F.col("__b_total") > HIGH_CARDINALITY_MIN_SAMPLES)
        & (eff > HIGH_CARDINALITY_UNIQUENESS)
    )
    is_id = (
        F.col("__k").rlike("(Id|ID)$") if hide_id_keys else F.lit(False)
    )
    hidden_reason = (
        F.when(is_id, F.lit("denylist"))
        .when(high_card, F.lit("high_cardinality"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        scored.withColumn("hidden_reason", hidden_reason)
        .withColumn("hidden", F.col("hidden_reason").isNotNull())
        .select(
            F.col("__k").alias("key"), "base_score", "boost", "score",
            "hidden", "hidden_reason",
        )
        .orderBy(F.desc("score"), F.asc("key"))
    )


def compute_comparison_score(
    target_values: dict[str, float], baseline_values: dict[str, float]
) -> float:
    """Pure-Python scorer (eventDeltas.ts:228-265) for tests / driver use."""
    all_values = set(target_values) | set(baseline_values)
    if not all_values:
        return 0.0
    tsum = sum(target_values.values())
    bsum = sum(baseline_values.values())
    if tsum == 0 and bsum == 0:
        return 0.0
    if tsum == 0 or bsum == 0:
        present = target_values if tsum > 0 else baseline_values
        if len(present) <= 1:
            return 0.0
        psum = tsum if tsum > 0 else bsum
        return max(v / psum * 100 for v in present.values())
    return max(
        abs(
            target_values.get(v, 0) / tsum * 100
            - baseline_values.get(v, 0) / bsum * 100
        )
        for v in all_values
    )


def get_stable_sample_expression(span_id_expression: Optional[str] = None) -> str:
    """eventDeltas.ts:304-309 getStableSampleExpression twin — the
    ClickHouse-dialect ordering expression the reference embeds in its
    sampling query (``cityHash64(<expr>)``, falling back to ``rand()``).
    The Spark-side :func:`stable_sample` uses ``xxhash64`` for the same
    stable-identity ordering (chcompat translates cityHash64 the same way;
    hash VALUES differ from ClickHouse, ordering stability is what
    matters)."""
    if span_id_expression:
        return f"cityHash64({span_id_expression})"
    return "rand()"


def compute_effective_sample_size(total_count: int) -> int:
    """eventDeltas.ts:311-317 computeEffectiveSampleSize twin: 1% of total
    clamped to [500, 5000]; non-positive totals fall back to the default
    SAMPLE_SIZE (1000). The 1% is the reference's IEEE-754 product
    (``Math.ceil(totalCount * 0.01)``), not integer ceil-division — e.g.
    2900 * 0.01 rounds to 29.000000000000004 and ceils to 30."""
    import math

    if total_count <= 0:
        return SAMPLE_SIZE
    return min(
        MAX_SAMPLE_SIZE,
        max(MIN_SAMPLE_SIZE, math.ceil(total_count * SAMPLE_RATIO)),
    )


def stable_sample(
    df: DataFrame, id_col: Optional[str], n: int, total: Optional[int] = None
) -> DataFrame:
    """Reference sampling policy (eventDeltas.ts:299-317): 1% of total
    clamped to [500, 5000] (default 1000 when the total is unknown-zero),
    ordered by a stable hash of the row id."""
    if total is None:
        total = df.count()
    if total > 0:
        n = compute_effective_sample_size(total)
    key = F.xxhash64(F.col(id_col)) if id_col else F.rand(42)
    return df.orderBy(key).limit(n)


# ---------------------------------------------------------------------------
# Delta-chart client-side helpers (app deltaChartUtils.ts — the UI half of
# event deltas; pure functions over already-aggregated value statistics)
# ---------------------------------------------------------------------------

MAX_CHART_VALUES = 6
MAX_CHART_VALUES_UPPER = 8


def merge_value_statistics_maps(
    outlier_values: dict, inlier_values: dict
) -> list[dict]:
    """deltaChartUtils.ts:54-79 mergeValueStatisticsMaps: the union of value
    names, sorted (so timestamps order), with per-side counts defaulted 0."""
    names = sorted(set(outlier_values) | set(inlier_values))
    return [
        {
            "name": v,
            "outlierCount": outlier_values.get(v, 0),
            "inlierCount": inlier_values.get(v, 0),
        }
        for v in names
    ]


def apply_top_n_aggregation(data: list[dict]) -> list[dict]:
    """deltaChartUtils.ts:84-119 applyTopNAggregation: adaptive top-N — at
    most MAX_CHART_VALUES_UPPER distinct values render in full (avoids the
    awkward 'Other (1)' cases); beyond that, the top MAX_CHART_VALUES by
    combined count are kept and the rest collapse into one
    'Other (N)' entry accumulating both counts."""
    if len(data) <= MAX_CHART_VALUES_UPPER:
        return data
    ordered = sorted(
        data, key=lambda d: -(d["outlierCount"] + d["inlierCount"])
    )
    top, rest = ordered[:MAX_CHART_VALUES], ordered[MAX_CHART_VALUES:]
    return top + [
        {
            "name": f"Other ({len(rest)})",
            "outlierCount": sum(d["outlierCount"] for d in rest),
            "inlierCount": sum(d["inlierCount"] for d in rest),
            "isOther": True,
        }
    ]


def flattened_key_to_sql_expression(key: str, column_meta: list) -> str:
    """deltaChartUtils.ts:131-171 flattenedKeyToSqlExpression: a flattened
    dot-notation key from flatten_data back to a valid SQL accessor —
    ``Map.sub.key`` -> ``Map['sub.key']``, ``ArrOfMap[0].k`` ->
    ``ArrOfMap[1]['k']`` (JS 0-based -> CH 1-based); unmatched keys pass
    through."""
    for col in column_meta:
        name = col["name"] if isinstance(col, dict) else col[0]
        ctype = col["type"] if isinstance(col, dict) else col[1]
        base = strip_type_wrappers(ctype)
        if base.startswith("Map("):
            if key.startswith(name + "."):
                map_key = key[len(name) + 1:].replace("'", "''")
                return f"{name}['{map_key}']"
        elif base.startswith("Array("):
            inner = strip_type_wrappers(base[len("Array("):-1])
            if inner.startswith("Map("):
                m = re.match(
                    rf"^{re.escape(name)}\[(\d+)\]\.(.+)$", key
                )
                if m:
                    ch_index = int(m.group(1)) + 1
                    map_key = m.group(2).replace("'", "''")
                    return f"{name}[{ch_index}]['{map_key}']"
    return key


def flattened_key_to_filter_key(key: str, column_meta: list) -> str:
    """deltaChartUtils.ts:177-188: currently identical to the SQL
    expression form (kept separate upstream for future divergence)."""
    return flattened_key_to_sql_expression(key, column_meta)


def compute_entropy_score(value_percentages: dict) -> float:
    """deltaChartUtils.ts:204-230 computeEntropyScore: 1 - normalized
    Shannon entropy over the value distribution; 0 for degenerate
    (single-value / empty / zero-total) inputs."""
    import math

    n = len(value_percentages)
    if n <= 1:
        return 0.0
    total = sum(value_percentages.values())
    if total == 0:
        return 0.0
    entropy = 0.0
    for pct in value_percentages.values():
        p = pct / total
        if p > 0:
            entropy -= p * math.log2(p)
    max_entropy = math.log2(n)
    if max_entropy == 0:
        return 0.0
    return 1 - entropy / max_entropy
