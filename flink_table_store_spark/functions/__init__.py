from flink_table_store_spark.functions.catalog_functions import (
    FunctionManager,
    bucket,
    register_builtins,
)

__all__ = ["FunctionManager", "bucket", "register_builtins"]
