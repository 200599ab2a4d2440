from datagouv_tools_spark.pipelines.sirene import import_sirene
from datagouv_tools_spark.pipelines.fantoir import import_fantoir
from datagouv_tools_spark.pipelines.deces import import_deces

__all__ = ["import_sirene", "import_fantoir", "import_deces"]
