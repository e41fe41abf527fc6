"""r17: Drain tokenize/flatten memoization — behavior must be identical to
the unmemoized path (the memos cache PURE functions; token lists are shared
but never mutated in place)."""

import random

from hyperdx_spark.analytics.drain import Drain, flatten_body


def _stream(n=4000, seed=7):
    rng = random.Random(seed)
    msgs = []
    for _ in range(n):
        msgs.append(
            f"{rng.choice(['error', 'ok', 'warn'])} user {rng.randrange(7)} "
            f"took {rng.randrange(30)} ms"
        )
    return msgs


def test_memoized_miner_matches_cold_cache_miner():
    msgs = _stream()
    warm = Drain()
    cold = Drain()
    for m in msgs:
        warm.add_log_message(m)
        cold._tok_cache.clear()  # force the memo to miss every call
        cold.add_log_message(m)
    assert len(warm._tok_cache) > 0
    assert {c.template() for c in warm.clusters.values()} == {
        c.template() for c in cold.clusters.values()
    }
    assert sorted(c.size for c in warm.clusters.values()) == sorted(
        c.size for c in cold.clusters.values()
    )


def test_tokenize_respects_extra_delimiters_and_cap():
    d = Drain(extra_delimiters=["|"])
    assert d.tokenize("a|b c") == ["a", "b", "c"]
    assert d.tokenize("a|b c") is d.tokenize("a|b c")  # memo hit
    d._tok_cache.clear()
    for i in range(70000):
        d.tokenize(f"msg {i}")
    assert len(d._tok_cache) <= 65536  # cap cleared at the bound


def test_shared_token_list_never_corrupts_templates():
    d = Drain()
    c1, _ = d.add_log_message("job 1 done")
    tpl_before = list(c1.template_tokens)
    # same content again: memo returns the SAME list; the cluster's template
    # must stay intact (replaced-not-mutated invariant)
    c2, _ = d.add_log_message("job 1 done")
    assert c2 is c1
    assert c1.template_tokens == tpl_before
    # diverging message rewrites the template as a NEW list
    c3, status = d.add_log_message("job 2 done")
    assert c3 is c1 and status == "cluster_template_changed"
    assert d.tokenize("job 1 done") == ["job", "1", "done"]  # memo unpoisoned


def test_flatten_body_pure():
    s = "a  b\tc\nd"
    assert flatten_body(s) == flatten_body(s)
