"""Builder-config → editable raw-SQL template conversion.

Parity target: ``packages/common-utils/src/core/builderToRawSql.ts`` —
renders a builder ChartConfig as a raw-SQL template using the dynamic
``$__`` macros ($__timeFilter, $__timeInterval, $__sourceTable, $__filters)
in place of bound date/interval/table values, or returns a user-facing
reason the config can't be represented as one editable SQL statement.

The generated template is executable by this engine's own macro path
(``macros.replace_macros`` + ``spark.sql`` over ``io.register_tables``) and
must produce the same result as compiling the config directly — the driver
entry asserts exactly that.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql.types import StructType

from hyperdx_spark.compile import _Ctx, _agg_expr, _condition_sql, _xlate
from hyperdx_spark.lucene.serializer import SearchQueryBuilder
from hyperdx_spark.model import ChartConfig, QuerySettings, SelectCol, SqlAstFilter, SqlFilter


@dataclass
class RenderedSqlTemplate:
    """Either the generated SQL template or a user-facing error."""

    sql: Optional[str] = None
    error: Optional[str] = None

    @property
    def is_error(self) -> bool:
        return self.error is not None


def builder_to_raw_sql(
    cfg: ChartConfig,
    schema: Optional[StructType] = None,
    settings: Optional[QuerySettings] = None,
) -> RenderedSqlTemplate:
    """Render *cfg* as a macro-templated raw SQL string.

    ``schema`` is needed when any condition uses the Lucene language (the
    serializer is schema-aware); SQL-language configs convert without it.
    """
    if not isinstance(cfg.select, (list, tuple)):
        return RenderedSqlTemplate(
            error="This chart type cannot be auto-converted to SQL."
        )
    if not cfg.source or not cfg.source.table:
        return RenderedSqlTemplate(
            error="Auto-converting to SQL requires a source to be selected."
        )
    if cfg.ctes:
        return RenderedSqlTemplate(
            error="CTE pipelines cannot be auto-converted to a single SQL statement."
        )
    if cfg.series_limit or cfg.fill_nulls is not None:
        return RenderedSqlTemplate(
            error="Series limits and null-filling are client features and are"
            " not part of the SQL statement."
        )
    needs_lucene = (cfg.where and cfg.where_language == "lucene") or any(
        sc.agg_condition and sc.agg_condition_language == "lucene"
        for sc in cfg.select
    ) or (cfg.having and cfg.having_language == "lucene")
    if needs_lucene and schema is None:
        return RenderedSqlTemplate(
            error="Lucene conditions need the source schema to convert;"
            " pass schema=df.schema."
        )

    source = cfg.source
    builder = SearchQueryBuilder(schema or StructType([]), source)
    ts = source.timestamp_value_expression
    is_granular = cfg.granularity is not None
    ctx = _Ctx(
        config=cfg,
        source=source,
        builder=builder,
        settings=settings or QuerySettings(),
        ts_expr=_xlate(source, ts),
        bucket_seconds=None,  # the template buckets via $__timeInterval
        ts_filter_exprs=(),
    )

    select_parts: list[str] = []
    group_parts: list[str] = []
    if is_granular:
        select_parts.append(f"$__timeInterval({_xlate(source, ts)}) AS {cfg.timestamp_alias}")
        group_parts.append(str(len(select_parts)))
    for g in cfg.group_by:
        select_parts.append(_xlate(source, g))
        group_parts.append(str(len(select_parts)))
    is_agg = any(sc.agg_fn not in (None, "none") for sc in cfg.select)
    for sc in cfg.select:
        expr_sql, alias = _agg_expr(ctx, sc)
        select_parts.append(f"{expr_sql} AS `{alias}`")

    where_parts = [f"$__timeFilter({_xlate(source, ts)})"]
    if cfg.where:
        where_parts.append(f"({_condition_sql(ctx, cfg.where, cfg.where_language)})")
    for flt in cfg.filters:
        if isinstance(flt, SqlFilter):
            where_parts.append(f"({_condition_sql(ctx, flt.condition, flt.type)})")
        elif isinstance(flt, SqlAstFilter):
            from hyperdx_spark.lucene.serializer import _sql_str

            right = flt.right
            right_sql = (
                _sql_str(right)
                if isinstance(right, str) and flt.right_is_literal
                else str(right)
            )
            where_parts.append(f"(({_xlate(source, flt.left)}) {flt.operator} {right_sql})")
    where_parts.append("$__filters")

    sql = "SELECT " + ",\n       ".join(select_parts)
    sql += "\nFROM $__sourceTable"
    sql += "\nWHERE " + "\n  AND ".join(where_parts)
    if is_agg and group_parts:
        sql += "\nGROUP BY " + ", ".join(group_parts)
    if cfg.having:
        sql += f"\nHAVING {_condition_sql(ctx, cfg.having, cfg.having_language)}"
    order = cfg.order_by
    if isinstance(order, str) and order.strip():
        sql += f"\nORDER BY {order}"
    elif is_agg and is_granular:
        sql += f"\nORDER BY {cfg.timestamp_alias}"
    if cfg.limit is not None:
        sql += f"\nLIMIT {cfg.limit}"
        if cfg.offset:
            sql += f" OFFSET {cfg.offset}"
    return RenderedSqlTemplate(sql=sql)
