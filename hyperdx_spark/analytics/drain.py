"""Drain log-template mining (He et al., ICWS 2017).

Parity target: the reference's TS port of drain3 —
``packages/common-utils/src/drain/drain.ts:1-370`` (fixed-depth prefix tree,
similarity 0.4, numeric-token parametrization to ``<*>``) and
``drain/mine-patterns.ts:91-204`` (sampled mining, per-cluster templates,
estimated counts via sampleMultiplier, per-bucket trend, 10% denoise
threshold). This is a fresh Python implementation of the published
algorithm, not a port of that file.

Two execution modes:

* ``mine_patterns``: the reference's shape — Drain over a ≤10k-row sample
  collected to the driver; estimated counts scale by total/sample.
* ``mine_patterns_distributed``: per-partition Drain via ``mapInPandas``
  (each task mines its partition locally and emits (template, count,
  bucket, sample) summaries), then a driver-side merge feeds the partial
  templates through a global Drain weighted by their counts. At 100 TB the
  heavy pass is embarrassingly parallel and only templates (thousands)
  cross the wire.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

PARAM = "<*>"
_WS = re.compile(r"\s+")
_HAS_DIGIT = re.compile(r"\d")

DENOISE_SAMPLE_SIZE = 10_000   # mine-patterns.ts:14
DENOISE_NOISE_THRESHOLD = 0.1  # mine-patterns.ts:17


def flatten_body(s: str) -> str:
    """Collapse newlines/whitespace runs (mine-patterns.ts:23-28)."""
    return _WS.sub(" ", s.replace("\n", " ")).strip()


def apply_masking(
    content: str,
    instructions: "Sequence[tuple[str, str]]",
    *,
    mask_prefix: str = "<",
    mask_suffix: str = ">",
) -> str:
    """Pre-clustering masking (drain/masking.ts LogMasker + the
    TemplateMiner's masker pass): each (pattern, mask_with) instruction
    replaces every regex match with ``<mask_with>``, applied in order —
    masked values (IPs, UUIDs, emails, ...) cluster as one token instead of
    exploding the template space. The default config carries NO
    instructions (config.ts:14), matching the reference."""
    import re as _re

    for pattern, mask_with in instructions:
        content = _re.sub(pattern, f"{mask_prefix}{mask_with}{mask_suffix}", content)
    return content


@dataclass
class LogCluster:
    cluster_id: int
    template_tokens: list[str]
    size: int = 1

    def template(self) -> str:
        return " ".join(self.template_tokens)


class _Node:
    __slots__ = ("children", "cluster_ids")

    def __init__(self) -> None:
        self.children: dict[str, _Node] = {}
        self.cluster_ids: list[int] = []


class Drain:
    """Fixed-depth prefix-tree clustering of log messages.

    Tree levels: root -> token count -> first maxNodeDepth-1 tokens (numeric
    tokens collapse to ``<*>``) -> leaf holding candidate clusters compared
    by position-wise similarity.
    """

    def __init__(
        self,
        depth: int = 4,
        sim_th: float = 0.4,
        max_children: int = 100,
        max_clusters: Optional[int] = None,
        extra_delimiters: "Sequence[str]" = (),
        param_str: str = PARAM,
        parametrize_numeric_tokens: bool = True,
    ) -> None:
        if depth < 3:
            raise ValueError("depth must be at least 3")
        self.max_node_depth = depth - 2
        self.sim_th = sim_th
        self.max_children = max_children
        self.max_clusters = max_clusters
        self.extra_delimiters = list(extra_delimiters)
        self.param_str = param_str
        self.parametrize_numeric_tokens = parametrize_numeric_tokens
        self.root = _Node()
        self.clusters: dict[int, LogCluster] = {}
        self._counter = 0
        self._tok_cache: dict[str, list[str]] = {}

    # -- tokenization -------------------------------------------------------
    def tokenize(self, content: str) -> list[str]:
        # Pure in (content, extra_delimiters), and extra_delimiters is fixed
        # per instance — memoized (r17): mining corpora repeat bodies heavily
        # (12.5x duplication on the gate corpus), and the returned list is
        # shared safely because token lists are never mutated in place
        # (templates are REPLACED on change, never edited).  Bounded: the
        # cache resets at 64k distinct messages.
        cached = self._tok_cache.get(content)
        if cached is not None:
            return cached
        c = content.strip()
        for delim in self.extra_delimiters:
            c = c.replace(delim, " ")
        toks = _WS.split(c) if c else []
        if len(self._tok_cache) >= 65536:
            self._tok_cache.clear()
        self._tok_cache[content] = toks
        return toks

    # -- similarity ---------------------------------------------------------
    def _seq_distance(
        self, template: list[str], tokens: list[str], include_params: bool
    ) -> tuple[float, int]:
        if not template:
            return 1.0, 0
        sim = 0
        params = 0
        for t, x in zip(template, tokens):
            if t == self.param_str:
                params += 1
            elif t == x:
                sim += 1
        if include_params:
            sim += params
        return sim / len(template), params

    def _fast_match(
        self,
        cluster_ids: Iterable[int],
        tokens: list[str],
        sim_th: float,
        include_params: bool,
    ) -> Optional[int]:
        best: tuple[float, int, Optional[int]] = (-1.0, -1, None)
        for cid in cluster_ids:
            cluster = self.clusters.get(cid)
            if cluster is None:
                continue
            sim, params = self._seq_distance(
                cluster.template_tokens, tokens, include_params
            )
            if sim > best[0] or (sim == best[0] and params > best[1]):
                best = (sim, params, cid)
        return best[2] if best[0] >= sim_th else None

    # -- tree ---------------------------------------------------------------
    def _tree_search(
        self, tokens: list[str], sim_th: float, include_params: bool
    ) -> Optional[int]:
        node = self.root.children.get(str(len(tokens)))
        if node is None:
            return None
        if not tokens:
            # first LIVE id: an evicted cluster's id can dangle in the tree
            # (drain.ts:190-193 would crash on a stale head; Drain3's
            # LRUCache.get-returns-None degrade is the intended behavior —
            # same liveness rule _fast_match applies)
            return next(
                (cid for cid in node.cluster_ids if cid in self.clusters), None
            )
        depth = 1
        for token in tokens:
            if depth >= self.max_node_depth or depth >= len(tokens):
                break
            child = node.children.get(token) or node.children.get(self.param_str)
            if child is None:
                return None
            node = child
            depth += 1
        return self._fast_match(node.cluster_ids, tokens, sim_th, include_params)

    def _add_to_tree(self, cluster_id: int, template: list[str]) -> None:
        key = str(len(template))
        node = self.root.children.setdefault(key, _Node())
        if not template:
            node.cluster_ids = [cluster_id]
            return
        depth = 1
        for token in template:
            if depth >= self.max_node_depth or depth >= len(template):
                ids = [c for c in node.cluster_ids if c in self.clusters]
                ids.append(cluster_id)
                node.cluster_ids = ids
                break
            if token not in node.children:
                if self.parametrize_numeric_tokens and _HAS_DIGIT.search(token):
                    node = node.children.setdefault(self.param_str, _Node())
                elif self.param_str in node.children:
                    if len(node.children) < self.max_children:
                        node = node.children.setdefault(token, _Node())
                    else:
                        node = node.children[self.param_str]
                else:
                    if len(node.children) + 1 < self.max_children:
                        node = node.children.setdefault(token, _Node())
                    elif len(node.children) + 1 == self.max_children:
                        node = node.children.setdefault(self.param_str, _Node())
                    else:
                        node = node.children[self.param_str]
            else:
                node = node.children[token]
            depth += 1

    # -- public -------------------------------------------------------------
    def create_template(self, seq1: list[str], seq2: list[str]) -> list[str]:
        """Position-wise merge (drain.ts:138-143): equal tokens survive,
        diverging positions become the param token; unequal lengths raise."""
        if len(seq1) != len(seq2):
            raise ValueError("seq1 and seq2 must have equal length")
        return [a if a == b else self.param_str for a, b in zip(seq1, seq2)]

    @property
    def cluster_count(self) -> int:
        """Live cluster count (drain.ts:53-56)."""
        return len(self.clusters)

    def total_cluster_size(self) -> int:
        """Sum of sizes of LIVE clusters (drain.ts:58-66
        getTotalClusterSize) — evicted clusters drop out of the total."""
        return sum(c.size for c in self.clusters.values())

    def add_log_message(self, content: str, weight: int = 1) -> tuple[LogCluster, str]:
        tokens = self.tokenize(content)
        match_id = self._tree_search(tokens, self.sim_th, include_params=False)
        if match_id is None:
            self._counter += 1
            cluster = LogCluster(self._counter, tokens, size=weight)
            # LruCache.put evicts the tail BEFORE inserting when at capacity
            # (lru-cache.ts:48-62); python dict insertion order + touch-on-
            # match below makes next(iter(...)) the true LRU head.
            if self.max_clusters is not None and len(self.clusters) >= self.max_clusters:
                lru = next(iter(self.clusters))
                del self.clusters[lru]
            self.clusters[self._counter] = cluster
            self._add_to_tree(cluster.cluster_id, tokens)
            return cluster, "cluster_created"
        cluster = self.clusters[match_id]
        new_template = self.create_template(tokens, cluster.template_tokens)
        changed = new_template != cluster.template_tokens
        cluster.template_tokens = new_template
        cluster.size += weight
        # Touch to update LRU recency on every match (drain.ts:311
        # clusterGet -> lru-cache.ts moveToHead). The reference only
        # reorders in the capacity-limited store; reads via peek
        # (_fast_match, match()) never touch.
        if self.max_clusters is not None:
            del self.clusters[match_id]
            self.clusters[match_id] = cluster
        return cluster, ("cluster_template_changed" if changed else "none")

    def match(self, content: str, full_search: str = "never") -> Optional[LogCluster]:
        """Exact-template match (sim 1.0, params wildcard-match); strategy ∈
        always|never|fallback (drain.ts:152-190 analogue)."""
        tokens = self.tokenize(content)

        def _full() -> Optional[LogCluster]:
            node = self.root.children.get(str(len(tokens)))
            if node is None:
                return None
            ids: list[int] = []

            def rec(n: _Node) -> None:
                ids.extend(n.cluster_ids)
                for c in n.children.values():
                    rec(c)

            rec(node)
            mid = self._fast_match(ids, tokens, 1.0, include_params=True)
            return self.clusters.get(mid) if mid is not None else None

        if full_search == "always":
            return _full()
        mid = self._tree_search(tokens, 1.0, include_params=True)
        if mid is not None:
            return self.clusters.get(mid)
        return _full() if full_search == "fallback" else None


def _escape_regex(s: str) -> str:
    """template-miner.ts escapeRegex: the JS char set (note '-' included,
    spaces NOT — so the later '\\ ' -> '\\s+' rewrite is a kept-for-parity
    no-op, exactly as in the reference)."""
    return re.sub(r"[.*+?^${}()|\[\]\\\-]", lambda m: "\\" + m.group(0), s)


class TemplateMiner:
    """drain/template-miner.ts: masking + Drain + template-parameter
    extraction. Config fields mirror TemplateMinerConfig (config.ts:6-17):
    masking instructions are (pattern, mask_with) pairs applied in order
    before clustering; the Drain param token is ``mask_prefix + '*' +
    mask_suffix``.

    ``extract_parameters`` ports getTemplateParameterExtractionRegex
    (template-miner.ts:77-170): the mined template is regex-escaped, every
    ``<maskName>`` occurrence becomes a named capture group (instruction
    patterns under exact matching, lazy ``.+?`` otherwise or for ``*``),
    and extracted values are returned left-to-right by position in the
    message. Compiled extraction regexes are LRU-cached."""

    def __init__(
        self,
        *,
        depth: int = 4,
        sim_th: float = 0.4,
        max_children: int = 100,
        max_clusters: Optional[int] = None,
        extra_delimiters: "Sequence[str]" = (),
        mask_prefix: str = "<",
        mask_suffix: str = ">",
        masking_instructions: "Sequence[tuple[str, str]]" = (),
        parametrize_numeric_tokens: bool = True,
        parameter_extraction_cache_capacity: int = 3000,
    ) -> None:
        self.mask_prefix = mask_prefix
        self.mask_suffix = mask_suffix
        self.masking_instructions = list(masking_instructions)
        self.drain = Drain(
            depth,
            sim_th,
            max_children,
            max_clusters,
            extra_delimiters,
            mask_prefix + "*" + mask_suffix,
            parametrize_numeric_tokens,
        )
        self._extra_delimiters = list(extra_delimiters)
        self._cache_capacity = parameter_extraction_cache_capacity
        self._extraction_cache: "dict[tuple, tuple]" = {}

    def _mask(self, content: str) -> str:
        return apply_masking(
            content,
            self.masking_instructions,
            mask_prefix=self.mask_prefix,
            mask_suffix=self.mask_suffix,
        )

    def add_log_message(self, log_message: str) -> dict:
        """AddLogMessageResult (template-miner.ts:56-67) as a dict."""
        cluster, change_type = self.drain.add_log_message(self._mask(log_message))
        return {
            "change_type": change_type,
            "cluster_id": cluster.cluster_id,
            "cluster_size": cluster.size,
            "template_mined": cluster.template(),
            "cluster_count": self.drain.cluster_count,
        }

    def match(
        self, log_message: str, full_search_strategy: str = "never"
    ) -> Optional[LogCluster]:
        return self.drain.match(self._mask(log_message), full_search_strategy)

    def _mask_names(self) -> list[str]:
        out: list[str] = []
        for _p, name in self.masking_instructions:
            if name not in out:
                out.append(name)
        return out

    def _extraction_regex(
        self, log_template: str, exact_matching: bool
    ) -> tuple:
        key = (log_template, exact_matching)
        hit = self._extraction_cache.get(key)
        if hit is not None:
            return hit
        param_map: list[tuple[str, str]] = []
        counter = 0
        mask_names = self._mask_names() + ["*"]
        prefix = _escape_regex(self.mask_prefix)
        suffix = _escape_regex(self.mask_suffix)
        template_regex = _escape_regex(log_template)
        for mask_name in mask_names:
            search = prefix + _escape_regex(mask_name) + suffix
            while True:
                allowed: list[str] = []
                if exact_matching and mask_name != "*":
                    allowed.extend(
                        p for p, n in self.masking_instructions if n == mask_name
                    )
                if not exact_matching or mask_name == "*":
                    allowed.append(".+?")
                group = f"p_{counter}"
                counter += 1
                # the reference records the group name even on the iteration
                # that finds no further occurrence; absent groups are simply
                # skipped at extraction time
                param_map.append((group, mask_name))
                capture = f"(?P<{group}>{'|'.join(allowed)})"
                if search in template_regex:
                    template_regex = template_regex.replace(search, capture, 1)
                else:
                    break
        template_regex = template_regex.replace("\\ ", "\\s+")
        result = (re.compile("^" + template_regex + "$"), param_map)
        # insertion-order eviction is the REFERENCE behavior here: reads go
        # through LruCache.peek (template-miner.ts:120), which never touches
        # recency, so its "LRU" degenerates to FIFO for this cache
        if len(self._extraction_cache) >= self._cache_capacity:
            self._extraction_cache.pop(next(iter(self._extraction_cache)))
        self._extraction_cache[key] = result
        return result

    def extract_parameters(
        self,
        log_template: str,
        log_message: str,
        exact_matching: bool = True,
    ) -> Optional[list]:
        """[(value, mask_name), ...] left-to-right, or None when the
        message does not fit the template (template-miner.ts:77-116)."""
        message = log_message
        for delim in self._extra_delimiters:
            message = message.replace(delim, " ")
        regex, param_map = self._extraction_regex(log_template, exact_matching)
        m = regex.match(message)
        if m is None:
            return None
        groups = m.groupdict()
        extracted = [
            (groups[g], name)
            for g, name in param_map
            if groups.get(g) is not None
        ]
        # sort by FIRST occurrence of the value string — deliberately the
        # reference's message.indexOf(a.value) (template-miner.ts:104-110,
        # itself mirroring Drain3's set-iteration quirk), which can misorder
        # repeated values; m.start(group) would differ from the reference
        extracted.sort(key=lambda vn: message.index(vn[0]))
        return extracted


@dataclass
class PatternGroup:
    id: str
    pattern: str
    sample_count: int
    estimated_count: int
    samples: list = field(default_factory=list)
    trend: list = field(default_factory=list)  # [(bucket_epoch_s, est_count)]


def _trend_spine(
    date_range: Optional[tuple], trend_buckets: int, bucket_seconds: int
) -> tuple[int, Optional[int], Optional[list]]:
    """(bucket step, null-ts fallback epoch, zero-fill spine) shared by
    both miners: with a date_range the step comes from the auto-granularity
    ladder and the spine zero-fills every grid-aligned bucket
    (timeBucketByGranularity, core/utils.ts:540-557; null-ts -> range start,
    mine-patterns.ts:134)."""
    if date_range is None:
        return bucket_seconds, None, None
    from hyperdx_spark.granularity import auto_granularity, granularity_seconds

    step = granularity_seconds(auto_granularity(date_range, trend_buckets))
    start_epoch = int(date_range[0].timestamp())
    end_epoch = date_range[1].timestamp()
    aligned = (start_epoch // step) * step
    return step, start_epoch, list(range(aligned, int(end_epoch), step))


def mine_patterns(
    df: DataFrame,
    *,
    text_col: str = "body",
    ts_col: Optional[str] = None,
    sample_size: int = DENOISE_SAMPLE_SIZE,
    total_count: Optional[int] = None,
    date_range: Optional[tuple] = None,
    trend_buckets: int = 24,
    bucket_seconds: int = 3600,
    max_samples: int = 5,
    noise_threshold: Optional[float] = None,
    masking: "Sequence[tuple[str, str]]" = (),
) -> list[PatternGroup]:
    """Reference-shaped sampled mining (drain/mine-patterns.ts:91-204):
    collect a bounded sample, Drain it on the driver, estimate totals with
    totalCount/sampleCount (``sampleMultiplier`` is 1 when totalCount is 0
    — ts:175-176), attach per-bucket trends and up to ``max_samples``
    example rows.

    With ``date_range`` the trend follows the reference exactly: the bucket
    step comes from the auto-granularity ladder targeting ``trend_buckets``
    buckets, the spine zero-fills EVERY bucket from the grid-aligned start
    to the range end (timeBucketByGranularity, core/utils.ts:540-557), and
    rows with a null timestamp fall back to the range start (ts:134).
    Without it, only observed ``bucket_seconds`` buckets are emitted (the
    pre-r10 shape, kept for trend-agnostic callers).

    ``noise_threshold`` drops patterns covering more than that fraction of
    the sample (denoise, 10% default in the reference's denoise path)."""
    if total_count is None:
        total_count = df.count()
    cols = [text_col] + ([ts_col] if ts_col else [])
    sdf = df.select(*cols).limit(sample_size)
    # r17 (guide §4/§5): the sample transfer used row-pickle collect() —
    # at the 200k-row q_log_patterns envelope that is ~0.7 s of pickle
    # plus ~0.6 s of driver-side Row construction for rows whose text is
    # the only thing read. Ship the sample through Arrow instead and build
    # genuine Row objects ONLY for the <= max_samples rows per cluster
    # that callers actually keep (signals.py reads samples[0][text_col] /
    # .__fields__, so sample elements stay Rows). Gated to the
    # string-text / no-timestamp shape every production caller uses:
    # with a ts_col the legacy path keeps collect()'s exact
    # naive-local-datetime values (Arrow returns tz-aware timestamps).
    rows = None
    texts = None
    if ts_col is None and isinstance(df.schema[text_col].dataType, StringType):
        try:
            texts = sdf.toArrow().column(0).to_pylist()
            # kwargs Row: __fields__ is a list, matching collect() rows
            _mk_row = lambda v: Row(**{text_col: v})  # noqa: E731
        except Exception:  # Arrow unavailable (e.g. Connect quirk) — fall back
            texts = None
    if texts is None:
        rows = sdf.collect()
        texts = [r[text_col] for r in rows]
    if not texts:
        return []

    step, start_epoch, spine = _trend_spine(date_range, trend_buckets, bucket_seconds)

    miner = Drain()
    clustered = []
    # flatten_body + apply_masking are pure per call (mask rules fixed):
    # memoized per raw string — the gate corpus repeats bodies ~12.5x
    fb_memo: dict[str, str] = {}
    for i, raw in enumerate(texts):
        key = str(raw) if raw is not None else ""
        body = fb_memo.get(key)
        if body is None:
            body = flatten_body(key)
            if masking:
                body = apply_masking(body, masking)
            fb_memo[key] = body
        cluster, _ = miner.add_log_message(body)
        ts = rows[i][ts_col] if ts_col else None
        clustered.append((cluster.cluster_id, body, ts, i))
    multiplier = total_count / len(texts) if total_count > 0 else 1.0

    groups: dict[int, dict] = {}
    for cid, body, ts, i in clustered:
        g = groups.setdefault(cid, {"n": 0, "samples": [], "buckets": {}, "first": body})
        g["n"] += 1
        if len(g["samples"]) < max_samples:
            g["samples"].append(rows[i] if rows is not None else _mk_row(texts[i]))
        epoch = (
            ts.timestamp() if ts is not None
            else (start_epoch if start_epoch is not None else None)
        )
        if epoch is not None:
            b = int(epoch // step) * step
            g["buckets"][b] = g["buckets"].get(b, 0) + 1

    out = []
    for cid, g in groups.items():
        matched = miner.match(flatten_body(g["first"]), full_search="fallback")
        template = matched.template() if matched else g["first"]
        if noise_threshold is not None and g["n"] / len(texts) > noise_threshold:
            continue
        if spine is not None:
            trend = [(b, round(g["buckets"].get(b, 0) * multiplier)) for b in spine]
        else:
            trend = sorted(
                (b, round(c * multiplier)) for b, c in g["buckets"].items()
            )
        out.append(
            PatternGroup(
                id=str(cid),
                pattern=template,
                sample_count=g["n"],
                estimated_count=max(round(g["n"] * multiplier), 1),
                samples=g["samples"],
                trend=trend,
            )
        )
    out.sort(key=lambda p: -p.estimated_count)
    return out


def mine_patterns_distributed(
    df: DataFrame,
    *,
    text_col: str = "body",
    ts_col: Optional[str] = None,
    min_count: int = 1,
    masking: "Sequence[tuple[str, str]]" = (),
    date_range: Optional[tuple] = None,
    trend_buckets: int = 24,
    bucket_seconds: int = 3600,
    max_samples: int = 5,
    noise_threshold: Optional[float] = None,
    merge_stats: Optional[dict] = None,
) -> list[PatternGroup]:
    """Scale path with the sampled miner's full output shape (r11): Drain
    each partition locally (mapInPandas) and ship per-cluster summaries —
    one totals row (template, count, up to ``max_samples`` raw sample
    lines) plus one (template, bucket, count) row per observed trend bucket
    — then merge on the driver by replaying templates (count-weighted)
    through a global Drain, summing bucket counts and concatenating bounded
    samples per merged cluster. Exact row counts, approximate cluster
    identity across partitions — the standard two-phase distributed
    formulation of a sequential clustering algorithm.

    Trend semantics mirror :func:`mine_patterns` (zero-filled
    auto-granularity spine under ``date_range``, observed
    ``bucket_seconds`` buckets otherwise, null timestamps fall back to the
    range start); ``noise_threshold`` drops clusters covering more than
    that fraction of ALL rows (the exact-count analogue of the sampled
    denoise rule). At 100 TB only templates × buckets (thousands) cross
    the wire — the heavy clustering pass stays embarrassingly parallel."""
    import pandas as pd

    mask_rules = list(masking)
    step, start_epoch, spine = _trend_spine(date_range, trend_buckets, bucket_seconds)
    want_trend = ts_col is not None or date_range is not None

    def mine_part(batches: Iterable["pd.DataFrame"]):
        miner = Drain()
        buckets: dict[int, dict[int, int]] = {}
        samples: dict[int, list[str]] = {}
        fb_memo: dict[str, str] = {}  # same pure-function memo as mine_patterns
        for pdf in batches:
            ts_vals = pdf[ts_col] if ts_col else None
            for i, body in enumerate(pdf[text_col]):
                raw = str(body) if body is not None else ""
                b = fb_memo.get(raw)
                if b is None:
                    b = flatten_body(raw)
                    if mask_rules:
                        b = apply_masking(b, mask_rules)
                    fb_memo[raw] = b
                cluster, _ = miner.add_log_message(b)
                cid = cluster.cluster_id
                ss = samples.setdefault(cid, [])
                if len(ss) < max_samples:
                    ss.append(raw)
                if not want_trend:
                    continue
                epoch = None
                if ts_vals is not None:
                    t = ts_vals.iloc[i]
                    if not pd.isnull(t):
                        # via datetime, not pandas Timestamp.timestamp():
                        # pandas reads naive as UTC, datetime as process-
                        # local — the spine and the sampled miner use the
                        # datetime convention, and mixing them shifts every
                        # bucket by the session UTC offset on non-UTC hosts
                        epoch = t.to_pydatetime().timestamp()
                if epoch is None:
                    epoch = start_epoch
                if epoch is not None:
                    bk = int(epoch // step) * step
                    d = buckets.setdefault(cid, {})
                    d[bk] = d.get(bk, 0) + 1
        if miner.clusters:
            data = []
            for cid, c in miner.clusters.items():
                data.append((c.template(), None, c.size, samples.get(cid, [])))
                for bk, n in (buckets.get(cid) or {}).items():
                    data.append((c.template(), bk, n, []))
            yield pd.DataFrame(
                data, columns=["template", "bucket", "count", "samples"]
            )

    cols = [text_col] + ([ts_col] if ts_col else [])
    partial = df.select(*cols).mapInPandas(
        mine_part, "template string, bucket long, count long, samples array<string>"
    )
    # pre-aggregate the partition summaries by (template, bucket) BEFORE the
    # driver collect: one shuffle of clusters x buckets rows caps the driver
    # fan-in at templates x (1 + buckets) regardless of cluster width (at
    # 1000 executors the unaggregated form would ship executors x that).
    # NULL bucket = the totals row; samples stay bounded via slice-of-flatten
    partial = partial.groupBy("template", "bucket").agg(
        F.sum("count").alias("count"),
        F.slice(
            F.flatten(F.collect_list("samples")), 1, max_samples
        ).alias("samples"),
    )

    # group partition summaries by template string (totals row carries the
    # weight and samples; bucket rows carry the trend detail)
    per_tpl: dict[str, dict] = {}
    totals_rows = bucket_rows = 0
    for row in partial.collect():
        e = per_tpl.setdefault(
            row["template"], {"total": 0, "buckets": {}, "samples": []}
        )
        if row["bucket"] is None:
            totals_rows += 1
            e["total"] += int(row["count"])
            for s in row["samples"] or []:
                if len(e["samples"]) < max_samples:
                    e["samples"].append(s)
        else:
            bucket_rows += 1
            b = int(row["bucket"])
            e["buckets"][b] = e["buckets"].get(b, 0) + int(row["count"])

    if merge_stats is not None:
        # what the driver fan-in actually received, so callers (and the
        # scale harness) can ASSERT the clusters x buckets bound instead of
        # assuming it: after the (template, bucket) pre-aggregation,
        # totals_rows = distinct templates and
        # bucket_rows <= totals_rows x distinct trend buckets
        merge_stats.update(
            {
                "merge_rows": totals_rows + bucket_rows,
                "totals_rows": totals_rows,
                "bucket_rows": bucket_rows,
                "distinct_templates": len(per_tpl),
                "distinct_buckets": len(
                    {b for e in per_tpl.values() for b in e["buckets"]}
                ),
            }
        )

    merged = Drain()
    stats: dict[int, dict] = {}
    for tpl, e in per_tpl.items():
        cluster, _ = merged.add_log_message(tpl, weight=e["total"])
        st = stats.setdefault(cluster.cluster_id, {"buckets": {}, "samples": []})
        for b, n in e["buckets"].items():
            st["buckets"][b] = st["buckets"].get(b, 0) + n
        for s in e["samples"]:
            if len(st["samples"]) < max_samples:
                st["samples"].append(s)

    grand_total = sum(c.size for c in merged.clusters.values())
    out = []
    for c in merged.clusters.values():
        if c.size < min_count:
            continue
        if (
            noise_threshold is not None
            and grand_total > 0
            and c.size / grand_total > noise_threshold
        ):
            continue
        st = stats.get(c.cluster_id, {"buckets": {}, "samples": []})
        if spine is not None:
            trend = [(b, st["buckets"].get(b, 0)) for b in spine]
        else:
            trend = sorted(st["buckets"].items())
        out.append(
            PatternGroup(
                id=str(c.cluster_id),
                pattern=c.template(),
                sample_count=c.size,
                estimated_count=c.size,
                samples=st["samples"],
                trend=trend,
            )
        )
    out.sort(key=lambda p: -p.estimated_count)
    return out


_TOKEN_OR_SEPARATOR = re.compile(r"([A-Za-z0-9]+)|([^A-Za-z0-9]+)")


def reconstruct_template(original_log: str, template_mined: str) -> str:
    """Re-inject mined template tokens into the original log's separator
    structure (ref: app components/Patterns/reconstructTemplate.ts:1-22) —
    the patterns-UI rendering of Drain output.  The original is
    whitespace-collapsed, then each alphanumeric run is replaced by the
    next template token (kept verbatim when the template runs short);
    separator runs pass through unchanged."""
    normalized = re.sub(r"\s+", " ", original_log)
    tokens = [t for t in template_mined.split(" ") if t]
    if not tokens:
        return normalized
    out = []
    token_idx = 0
    for m in _TOKEN_OR_SEPARATOR.finditer(normalized):
        if m.group(1) is not None:
            out.append(tokens[token_idx] if token_idx < len(tokens) else m.group(1))
            token_idx += 1
        else:
            out.append(m.group(2))
    return "".join(out)


def denoise_search_results(
    rows: list,
    sample_rows: list,
    *,
    body_column: str,
    total_count: int,
    noise_threshold: float = DENOISE_NOISE_THRESHOLD,
) -> dict:
    """mcp/tools/query/denoise.ts denoiseSearchResults: mine patterns from
    a SAMPLE, mark templates covering more than ``noise_threshold`` (10%)
    of it as noisy, train a matching miner on the same sample, and drop
    result rows whose matched template is noisy. Rows with a null body or
    no template match are KEPT; the body column resolves case-
    insensitively against the result keys (ClickHouse may return the
    expression under a simplified alias). Noisy templates key by TEMPLATE
    STRING, not cluster id — ids are miner-local.

    ``rows``/``sample_rows`` are driver-side dicts (the search results,
    bounded by the search limit — the reference's own shape). Returns
    ``{rows, removed_patterns, skipped?}``."""

    def body_of(row) -> str:
        raw = row.get("__hdx_pattern_body")
        return str(raw) if raw is not None else ""

    if not sample_rows:
        return {"rows": rows, "removed_patterns": [],
                "skipped": "no_sample_data"}

    # mine over the sample bodies (driver Drain, maxSamples minimized)
    miner0 = Drain()
    counts: dict[int, int] = {}
    for r in sample_rows:
        cluster, _ = miner0.add_log_message(flatten_body(body_of(r)))
        counts[cluster.cluster_id] = counts.get(cluster.cluster_id, 0) + 1
    sampled = len(sample_rows)
    multiplier = total_count / sampled if total_count > 0 else 1.0
    noisy: set[str] = set()
    removed = []
    for c in miner0.clusters.values():
        n = counts.get(c.cluster_id, 0)
        if n / sampled > noise_threshold:
            tpl = c.template()
            noisy.add(tpl)
            removed.append({
                "pattern": tpl,
                "estimated_count": round(n * multiplier),
                "sample_count": n,
            })
    if not noisy:
        return {"rows": rows, "removed_patterns": []}

    # a fresh miner trained on the same sample does the row matching
    miner = TemplateMiner()
    for r in sample_rows:
        miner.add_log_message(flatten_body(body_of(r)))

    if not rows:
        return {"rows": rows, "removed_patterns": removed}
    key = _find_body_column_key(rows[0], body_column)
    if key is None:
        return {"rows": rows, "removed_patterns": [],
                "skipped": "body_column_not_in_results"}

    kept = []
    for row in rows:
        v = row.get(key)
        if v is None:
            kept.append(row)  # no body: keep
            continue
        m = miner.match(flatten_body(str(v)), "fallback")
        if m is None or m.template() not in noisy:
            kept.append(row)
    return {"rows": kept, "removed_patterns": removed}


def _find_body_column_key(row: dict, body_column: str):
    """denoise.ts findBodyColumnKey: direct, then case-insensitive."""
    if body_column in row:
        return body_column
    lower = body_column.lower()
    for k in row:
        if k.lower() == lower:
            return k
    return None
