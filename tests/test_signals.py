"""Emerging & disappeared signals (hyperdx_spark.analytics.signals) —
emergingSignalsClassify.test.ts twinned + the composed tool executed."""

import pytest

from hyperdx_spark.analytics.signals import (
    classify_shift,
    emerging_signals,
    normalize_template,
)

RATIO = 3
FLOOR = 2 / 10_000


def test_classify_shift_reference_matrix():
    """emergingSignalsClassify.test.ts walked case by case."""
    c = classify_shift
    # brand-new (baseShare == 0): must clear the floor
    assert c(FLOOR, 0, RATIO, FLOOR) == "emerging"
    assert c(0.05, 0, RATIO, FLOOR) == "emerging"
    assert c(FLOOR / 2, 0, RATIO, FLOOR) is None
    # EXACT 3x at a 10k sample: the float boundary the tolerance admits
    assert c(3 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    assert c(3 / 500, 1 / 500, RATIO, FLOOR) == "emerging"
    # clearly under ratio stays out; the tolerance is tiny (2.9x out)
    assert c(2 / 500, 1 / 500, RATIO, FLOOR) is None
    assert c(2.9 / 10_000, 1 / 10_000, RATIO, FLOOR) is None
    # well above, and no epsilon penalty on clean shifts
    assert c(10 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    assert c(3.01 / 10_000, 1 / 10_000, RATIO, FLOOR) == "emerging"
    # disappeared: absent now, or >= ratio x rarer (exact boundary admits)
    assert c(0, 0.02, RATIO, FLOOR) == "disappeared"
    assert c(1 / 500, 3 / 500, RATIO, FLOOR) == "disappeared"
    assert c(1 / 10_000, 3 / 10_000, RATIO, FLOOR) == "disappeared"
    assert c(1 / 500, 2 / 500, RATIO, FLOOR) is None
    # stable patterns never classify — even at the schema-allowed ratio=1
    assert c(0.01, 0.01, RATIO, FLOOR) is None
    assert c(0.01, 0.01, 1, FLOOR) is None
    assert c(0.02, 0.01, 1, FLOOR) == "emerging"


def test_normalize_template():
    # <*> keeps a stable marker: 'a <*> b' must NOT collide with 'a b';
    # whitespace collapses, case folds (runEventPatterns.ts:252-258)
    assert normalize_template("A  <*>   B") == normalize_template("a <*> b")
    assert normalize_template("a <*> b") != normalize_template("a b")
    assert normalize_template("  X y  ") == "x y"


def test_emerging_signals_end_to_end(spark):
    """Composed tool over two synthetic windows: a template present only
    in the current window is 'new', one that vanished is 'gone', a 3x
    share shift is 'shifted'; stable templates stay out."""
    # varying numbers make Drain generalize to 'api request took <*> ms'
    # in BOTH windows, so the normalized key matches across them
    base_rows = (
        [("stable user login",)] * 40
        + [("legacy worker stopped",)] * 30
        + [(f"api request took {i} ms",) for i in range(10)]  # share 10/80
    )
    cur_rows = (
        [("stable user login",)] * 40
        + [(f"api request took {i} ms",) for i in range(30)]  # 3x the share
        + [("newsvc crashed hard",)] * 10                     # brand-new
    )
    base = spark.createDataFrame(base_rows, "body string")
    cur = spark.createDataFrame(cur_rows, "body string")
    out = emerging_signals(cur, base, text_col="body", sample_size=1000)

    em = {e["pattern"]: e for e in out["emerging"]}
    dis = {d["pattern"]: d for d in out["disappeared"]}
    assert "newsvc crashed hard" in em
    assert em["newsvc crashed hard"]["status"] == "new"
    assert em["newsvc crashed hard"]["baseline_share"] == 0.0
    shifted = next(
        e for p, e in em.items() if p.startswith("api request took")
    )
    assert shifted["status"] == "shifted"
    # shares: 30/80 vs 10/80 -> exactly 3x, the boundary the tolerance admits
    assert shifted["current_share"] == 0.375
    assert shifted["baseline_share"] == 0.125
    assert "legacy worker stopped" in dis
    assert dis["legacy worker stopped"]["status"] == "gone"
    # the stable template classifies as neither
    assert "stable user login" not in em and "stable user login" not in dis
    assert out["summary"]["current"]["sampled"] == 80
    assert out["summary"]["emerging_count"] == 2
    assert out["summary"]["disappeared_count"] == 1


def test_emerging_signals_rejects_overlapping_windows(spark):
    from datetime import datetime

    df = spark.createDataFrame([("x",)], "body string")
    with pytest.raises(ValueError, match="overlap"):
        emerging_signals(
            df, df,
            current_range=(datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 3)),
            baseline_range=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 2)),
        )
    # touching windows (baseline end == current start) are fine
    out = emerging_signals(
        df, df,
        current_range=(datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 2)),
        baseline_range=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 1)),
    )
    assert out["summary"]["emerging_count"] == 0
