from wingfoil_spark.streaming.stateful import KeyedStateOp, ewma_step, running_sum_step

__all__ = ["KeyedStateOp", "ewma_step", "running_sum_step"]
