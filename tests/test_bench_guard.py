"""bench.py load guard (VERDICT r11 #1): refuse to record a contaminated
artifact — bounded sleep-and-retry while the box is busy, extra samples when
the best-of-3 spread exceeds the documented ±50% noise band.

Pure-function tests: clock/loadavg/sleep are injected, no Spark session.
"""

from __future__ import annotations

import bench


class FakeClock:
    """monotonic() advances only when sleep() is called."""

    def __init__(self, loads):
        self.loads = list(loads)  # successive 1-min loadavg readings
        self.t = 0.0
        self.sleeps: list[float] = []

    def monotonic(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s

    def getloadavg(self):
        load = self.loads.pop(0) if len(self.loads) > 1 else self.loads[0]
        return (load, load, load)


def _wait(loads, threshold, max_wait_s=600.0, poll_s=15.0):
    clk = FakeClock(loads)
    out = bench.wait_for_quiet_box(
        threshold,
        max_wait_s,
        poll_s,
        getloadavg=clk.getloadavg,
        sleep=clk.sleep,
        monotonic=clk.monotonic,
    )
    return out, clk


def test_quiet_box_passes_immediately():
    out, clk = _wait([2.0], threshold=8.0)
    assert out == {
        "threshold": 8.0,
        "waited_s": 0.0,
        "loadavg_after_wait": 2.0,
        "gave_up": False,
    }
    assert clk.sleeps == []


def test_busy_box_waits_until_load_drops():
    # 3 busy readings, then quiet — guard polls through them and succeeds
    out, clk = _wait([12.0, 11.0, 9.5, 3.0], threshold=8.0)
    assert out["gave_up"] is False
    assert out["loadavg_after_wait"] == 3.0
    assert out["waited_s"] == 45.0  # three 15 s polls
    assert clk.sleeps == [15.0, 15.0, 15.0]


def test_busy_box_gives_up_after_max_wait_and_says_so():
    out, clk = _wait([20.0], threshold=8.0, max_wait_s=60.0)
    assert out["gave_up"] is True
    assert out["loadavg_after_wait"] == 20.0
    # bounded: total sleep never exceeds max_wait_s
    assert sum(clk.sleeps) <= 60.0 + 1e-9
    assert out["waited_s"] >= 60.0


def test_final_poll_is_clamped_to_remaining_budget():
    # max_wait 20 s, poll 15 s: second sleep must be clamped to ~5 s
    out, clk = _wait([20.0], threshold=8.0, max_wait_s=20.0)
    assert out["gave_up"] is True
    assert clk.sleeps == [15.0, 5.0]


def test_threshold_is_quarter_of_cpus_with_floor():
    assert bench.load_guard_threshold(32) == 8.0
    assert bench.load_guard_threshold(2) == 1.0  # floor: never below 1


def test_spread_band():
    # ±50% band over the WARM samples: (max-min)/min > 0.5 triggers
    assert bench.spread_exceeds_band([1.0, 1.2, 1.4]) is False  # warm 0.17
    assert bench.spread_exceeds_band([1.0, 1.2, 1.9]) is True   # warm 0.58
    assert bench.spread_exceeds_band([0.283, 0.29, 0.31]) is False
    # the cold first run legitimately exceeds warm by >band: NOT a trigger
    assert bench.spread_exceeds_band([3.0, 1.0, 1.1]) is False
    # a warm outlier (the r11 contention failure mode) triggers
    assert bench.spread_exceeds_band([1.9, 2.0, 19.9]) is True
    # two samples: no cold to exclude, judge as-is
    assert bench.spread_exceeds_band([1.0, 1.6]) is True
    # degenerate zero min never divides by zero
    assert bench.spread_exceeds_band([0.0, 0.0, 5.0]) is False


def test_contention_annotation_marks_only_over_threshold_queries():
    loads = {
        "q_quiet": [1.0, 2.1, 1.9, 2.0],
        "q_contended": [2.0, 4.0, 9.4, 8.5],   # neighbour landed mid-query
        "q_empty": [],                         # never sampled: never marked
        "q_edge": [8.0],                       # == threshold: not over
    }
    marked = bench.contention_annotation(loads, threshold=8.0)
    assert marked == {"q_contended": 9.4}


def test_contention_annotation_rounds_and_keeps_max():
    marked = bench.contention_annotation({"q": [8.555, 10.234, 9.0]}, 8.0)
    assert marked == {"q": 10.23}


def test_ambient_busy_cores_from_proc_stat_deltas():
    # two readings 1000 jiffies apart, 600 of them idle+iowait -> 40% busy
    reads = [(10_000, 7_000), (11_000, 7_600)]
    busy = bench.ambient_busy_cores(
        interval=0.0, read_stat=lambda: reads.pop(0),
        sleep=lambda s: None, ncpus=32,
    )
    assert busy == (400 / 1000) * 32


def test_ambient_busy_cores_degenerate_delta_is_zero():
    reads = [(10_000, 7_000), (10_000, 7_000)]
    assert bench.ambient_busy_cores(
        interval=0.0, read_stat=lambda: reads.pop(0),
        sleep=lambda s: None, ncpus=32,
    ) == 0.0


def test_ambient_busy_cores_unreadable_proc_stat_never_blocks():
    def boom():
        raise OSError("no /proc/stat")
    assert bench.ambient_busy_cores(
        interval=0.0, read_stat=boom, sleep=lambda s: None, ncpus=32,
    ) == 0.0


def test_wait_for_quiet_cpu_passes_when_ambient_low():
    clk = FakeClock([0.0])
    out = bench.wait_for_quiet_cpu(
        threshold_cores=2.0, max_wait_s=20.0, poll_s=2.0,
        busy=lambda: 0.5, sleep=clk.sleep, monotonic=clk.monotonic,
    )
    assert out == {"busy_cores": 0.5, "waited_s": 0.0, "gave_up": False}
    assert clk.sleeps == []


def test_wait_for_quiet_cpu_waits_then_succeeds():
    vals = [6.0, 5.0, 1.0]
    clk = FakeClock([0.0])
    out = bench.wait_for_quiet_cpu(
        threshold_cores=2.0, max_wait_s=20.0, poll_s=2.0,
        busy=lambda: vals.pop(0), sleep=clk.sleep, monotonic=clk.monotonic,
    )
    assert out["gave_up"] is False and out["busy_cores"] == 1.0
    assert clk.sleeps == [2.0, 2.0]


def test_wait_for_quiet_cpu_bounded_and_marks_gave_up():
    clk = FakeClock([0.0])
    out = bench.wait_for_quiet_cpu(
        threshold_cores=2.0, max_wait_s=5.0, poll_s=2.0,
        busy=lambda: 9.9, sleep=clk.sleep, monotonic=clk.monotonic,
    )
    assert out["gave_up"] is True
    assert sum(clk.sleeps) <= 5.0 + 1e-9


def test_headline_set_unchanged_since_r2():
    # the judged per-query series must stay comparable across rounds
    assert bench.HEADLINE == [
        "q_search",
        "q_timeseries_error_5m",
        "q_multi_agg",
        "q_conditional_agg",
        "q_series_limit",
        "q_gauge_last",
        "q_counter_rate",
        "q_heatmap",
        "q_tpch_q1",
        "q_tpch_q3",
        "q_tpch_q5ish",
        "q_top_customers",
        "q_text_stats",
        "q_dedup_exact",
        "q_minhash_lsh",
        "q_ann_cosine",
    ]


def _loop(timings, loads_max, ambient):
    return {
        "timings": timings,
        "loads": {n: [v] for n, v in loads_max.items()},
        "ambient": ambient,
        "ambient_contended": {
            n: b for n, b in ambient.items()
            if b > bench.AMBIENT_THRESHOLD_CORES
        },
    }


def test_choose_quieter_loop_prefers_fewer_contended():
    # loop1 had a mid-query loadavg spike on q_a; loop2 is clean but a hair
    # slower overall — fewer contended queries must win over raw total
    l1 = _loop({"q_a": 1.0, "q_b": 1.0}, {"q_a": 99.0, "q_b": 0.1},
               {"q_a": 0.0, "q_b": 0.0})
    l2 = _loop({"q_a": 1.2, "q_b": 1.1}, {"q_a": 0.1, "q_b": 0.1},
               {"q_a": 0.0, "q_b": 0.0})
    assert bench.choose_quieter_loop(l1, l2, threshold=8.0) == 2


def test_choose_quieter_loop_tie_goes_to_lower_total():
    l1 = _loop({"q_a": 1.0}, {"q_a": 0.1}, {"q_a": 0.0})
    l2 = _loop({"q_a": 0.8}, {"q_a": 0.1}, {"q_a": 0.0})
    assert bench.choose_quieter_loop(l1, l2, threshold=8.0) == 2
    assert bench.choose_quieter_loop(l2, l1, threshold=8.0) == 1


def test_loop_contention_score_unions_both_marks():
    l1 = _loop({"q_a": 1.0, "q_b": 1.0}, {"q_a": 99.0, "q_b": 0.1},
               {"q_a": 0.0, "q_b": 5.0})
    assert bench.loop_contention_score(l1, threshold=8.0) == 2


def test_choose_quieter_loop_both_contended_takes_lower_total():
    # r16: between two CONTENDED loops the lower total wins regardless of
    # mark count — marks come from sampling windows that interference can
    # escape (observed: 17.96 s loop with 2 marks vs 7.70 s loop with 4;
    # contention only ADDS time, so min total = least contaminated)
    l1 = _loop({"q_a": 9.0, "q_b": 9.0}, {"q_a": 99.0, "q_b": 0.1},
               {"q_a": 0.0, "q_b": 0.0})
    l2 = _loop({"q_a": 1.0, "q_b": 1.0}, {"q_a": 99.0, "q_b": 99.0},
               {"q_a": 0.0, "q_b": 0.0})
    assert bench.choose_quieter_loop(l1, l2, threshold=8.0) == 2
    assert bench.choose_quieter_loop(l2, l1, threshold=8.0) == 1


# --- one-line JSON size guard (VERDICT r16 #2) ------------------------------

def _worst_case_artifact():
    """A 16-query artifact with EVERY per-query map present and every query
    contended — the fattest line the current schema can produce."""
    qs = {n: 123.456 for n in bench.HEADLINE}
    env = {
        "ts_start": "2026-08-17T21:06:10+0000",
        "loadavg_start": [32.0, 32.0, 32.0],
        "cpus": 32,
        "load_guard": {"threshold": 8.0, "waited_s": 600.0,
                       "loadavg_after_wait": 32.0, "gave_up": True},
        "warmup_s": 99.999,
        "py_warmup_s": 99.999,
        "quiet_rerun_wait": {
            "load_guard": {"threshold": 8.0, "waited_s": 300.0,
                           "loadavg_after_wait": 32.0, "gave_up": True},
            "ambient": {"busy_cores": 32.0, "waited_s": 60.0, "gave_up": True},
            "note": "no quiet window appeared within the bounded wait; "
                    "publishing the contended loop (annotated below)",
        },
        "quiet_rerun": {"loop1_total": 999.999, "loop2_total": 999.999,
                        "loop1_contended": 16, "loop2_contended": 16,
                        "published_loop": 2, "trigger": "contention"},
        # bulky per-query diagnostics (these must be SPLIT OFF line one)
        "loadavg_per_query": {n: 32.99 for n in bench.HEADLINE},
        "ambient_busy_per_query": {n: 32.99 for n in bench.HEADLINE},
        "ambient_reruns": {n: 123.456 for n in bench.HEADLINE},
        "spread_reruns": {n: 2 for n in bench.HEADLINE},
        # bounded annotations (these STAY on line one)
        "contended_queries": {n: 32.99 for n in bench.HEADLINE},
        "ambient_contended": {n: 32.99 for n in bench.HEADLINE},
        "ts_end": "2026-08-17T21:08:26+0000",
        "loadavg_end": [32.0, 32.0, 32.0],
    }
    return qs, env


def test_slim_env_splits_bulky_maps_and_keeps_annotations(tmp_path):
    import json

    _, env = _worst_case_artifact()
    detail_path = str(tmp_path / "detail.json")
    slim = bench.slim_env(dict(env), detail_path)
    for k in bench.ENV_DETAIL_KEYS:
        assert k not in slim
    assert slim["env_detail_file"] == detail_path
    # annotations the driver reads stay on line one
    assert "contended_queries" in slim and "ambient_contended" in slim
    # nothing is lost: the sidecar holds exactly the split-off maps
    detail = json.load(open(detail_path))
    assert set(detail) == set(bench.ENV_DETAIL_KEYS)
    assert detail["loadavg_per_query"] == env["loadavg_per_query"]


def test_slim_env_unwritable_detail_path_never_fails(tmp_path):
    _, env = _worst_case_artifact()
    slim = bench.slim_env(dict(env), str(tmp_path / "no" / "dir" / "d.json"))
    assert "env_detail_file" not in slim  # diagnostics dropped, not fatal
    for k in bench.ENV_DETAIL_KEYS:
        assert k not in slim


def test_output_line_worst_case_stays_under_bound(tmp_path):
    """The BENCH_r15 failure mode: the one-line JSON grew until the driver's
    captured tail truncated it and parsed null, erasing a whole round's PERF
    table. Pin the worst-case line under the documented bound."""
    import json

    qs, env = _worst_case_artifact()
    slim = bench.slim_env(dict(env), str(tmp_path / "detail.json"))
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 1999.999,
            "unit": "sec",
            "queries": qs,
            "queries_cold": qs,
            "cold_total": 1999.999,
            "env": slim,
            "sf": 0.1,
        }
    )
    assert len(line.encode()) <= bench.MAX_LINE_BYTES, len(line.encode())
