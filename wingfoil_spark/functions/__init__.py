from wingfoil_spark.functions import text, dedup, similarity, lm

__all__ = ["text", "dedup", "similarity", "lm"]
