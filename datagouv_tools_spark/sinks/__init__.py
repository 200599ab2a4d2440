from datagouv_tools_spark.sinks.sink import (
    DryRunExecutor,
    SqlSink,
    ParquetSink,
)

__all__ = ["DryRunExecutor", "SqlSink", "ParquetSink"]
