from wingfoil_spark.sources.tables import (
    load_table,
    load_tables,
    events_stream,
    replay_rows,
    ticker,
)

__all__ = ["load_table", "load_tables", "events_stream", "replay_rows", "ticker"]
