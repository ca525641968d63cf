from wingfoil_spark.functions import text, dedup, similarity, lm, bpe

__all__ = ["text", "dedup", "similarity", "lm", "bpe"]
