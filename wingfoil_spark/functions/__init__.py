from wingfoil_spark.functions import text, dedup, similarity

__all__ = ["text", "dedup", "similarity"]
