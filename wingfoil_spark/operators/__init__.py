from wingfoil_spark.operators.stats import window_stat
from wingfoil_spark.operators.stateful import (
    ewma,
    drop_small_change,
    throttle_exact,
)

__all__ = ["window_stat", "ewma", "drop_small_change", "throttle_exact"]
