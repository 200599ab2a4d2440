from datagouv_tools_spark.functions.names import sanitize, to_snake

__all__ = ["sanitize", "to_snake"]
