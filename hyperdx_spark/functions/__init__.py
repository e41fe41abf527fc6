from hyperdx_spark.functions.chcompat import translate_expr

__all__ = ["translate_expr"]
