"""Infrastructure correlations: which k8s metric charts correlate with an
opened log/trace row (app infraCorrelations.ts + DBInfraPanel).

Declarative groups: ``detect_attribute`` gates whether the group appears
for a row's resource attributes; ``correlate_attribute`` is the attribute
the metric query filters by. The rendered metric name is
``{field_prefix}{field} - Gauge`` (DBInfraPanel), so
:func:`infra_metric_query` returns the (metric name, lucene where) pair a
metric ChartConfig needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence


@dataclass(frozen=True)
class InfraChartSpec:
    title: str
    card_test_id: str
    field: str
    number_format: str


@dataclass(frozen=True)
class InfraCorrelation:
    title: str
    detect_attribute: str
    correlate_attribute: str
    field_prefix: str
    charts: Sequence[InfraChartSpec] = field(default_factory=tuple)
    timeline_query_attribute: Optional[str] = None


# Pod and Node render the same three charts; only the prefix and the
# correlate filter differ (infraCorrelations.ts:40-60)
K8S_CHART_SPECS: tuple[InfraChartSpec, ...] = (
    InfraChartSpec("CPU Usage (%)", "cpu-usage-card", "cpu.utilization",
                   "percent"),
    InfraChartSpec("Memory Used", "memory-usage-card", "memory.usage",
                   "bytes"),
    InfraChartSpec("Disk Available", "disk-usage-card",
                   "filesystem.available", "bytes"),
)

# array order = render order (Pod, then Node) — infraCorrelations.ts:63-80
INFRA_CORRELATIONS: tuple[InfraCorrelation, ...] = (
    InfraCorrelation(
        title="Pod",
        detect_attribute="k8s.pod.uid",
        correlate_attribute="k8s.pod.uid",
        field_prefix="k8s.pod.",
        charts=K8S_CHART_SPECS,
        timeline_query_attribute="k8s.pod.uid",
    ),
    InfraCorrelation(
        title="Node",
        detect_attribute="k8s.node.name",
        correlate_attribute="k8s.node.name",
        field_prefix="k8s.node.",
        charts=K8S_CHART_SPECS,
    ),
)


def get_active_infra_correlations(
    resource_attributes: Optional[Mapping],
) -> list[InfraCorrelation]:
    """The built-in groups whose detect attribute is PRESENT (non-null —
    `!= null`, not truthiness, infraCorrelations.ts:86-96) on the row's
    resource attributes; the single source of truth for both the
    Infrastructure-tab gate and the panel renderer."""
    if not resource_attributes:
        return []
    return [
        c
        for c in INFRA_CORRELATIONS
        if resource_attributes.get(c.detect_attribute) is not None
    ]


def infra_metric_query(
    correlation: InfraCorrelation, chart: InfraChartSpec, attr_value: str
) -> tuple[str, str]:
    """(metric name, lucene where) for one correlation chart —
    DBInfraPanel's `${fieldPrefix}${field} - Gauge` metric filtered by the
    correlate attribute."""
    metric = f"{correlation.field_prefix}{chart.field} - Gauge"
    where = f'{correlation.correlate_attribute}:"{attr_value}"'
    return metric, where


def strip_field_clause(query: str, resource_attr: str, field: str) -> str:
    """app components/KubernetesFilters.tsx:62-75 stripFieldClause: drop
    the ``<resourceAttr>.<field>:"..."`` clause from a Lucene query,
    leaving every other clause and the free text intact — used to build
    each k8s dropdown's FACETED where (its own selection must not narrow
    its own options) and to rewrite the query on selection change. Dots
    and regex metacharacters in the attribute are literal; removing a
    mid-query clause collapses the leftover whitespace."""
    import re

    pattern = re.escape(f"{resource_attr}.{field}") + r':"[^"]*"'
    return re.sub(r"\s+", " ", re.sub(pattern, " ", query)).strip()
