from wingfoil_spark.functions import text, dedup, similarity, lm, bpe, selection

__all__ = ["text", "dedup", "similarity", "lm", "bpe", "selection"]
