from wingfoil_spark.plans import relational

__all__ = ["relational"]
