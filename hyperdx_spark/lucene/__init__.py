"""Lucene-dialect search language -> pyspark Column predicates.

Ref: hyperdxio/hyperdx ``packages/common-utils/src/queryParser.ts`` — grammar
via @hyperdx/lucene, AST serialized by ``CustomSchemaSQLSerializerV2`` with
schema-aware type dispatch. Here the parser is a hand-written recursive
descent (no dependency) and the serializer emits ``pyspark.sql.Column``.
"""

from hyperdx_spark.lucene.parser import parse
from hyperdx_spark.lucene.serializer import SearchQueryBuilder, lucene_to_column

__all__ = ["parse", "SearchQueryBuilder", "lucene_to_column"]
