from datagouv_tools_spark.sources.catalog import TESTDATA_TABLES, load_tables

__all__ = ["TESTDATA_TABLES", "load_tables"]
