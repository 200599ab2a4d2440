from datagouv_tools_spark.operators.dispatch import dispatch_by
from datagouv_tools_spark.operators.flatten import flatten_array_to_columns

__all__ = ["dispatch_by", "flatten_array_to_columns"]
