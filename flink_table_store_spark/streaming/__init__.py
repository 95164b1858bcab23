from flink_table_store_spark.streaming.source import SnapshotStream
from flink_table_store_spark.streaming.sink import foreach_batch_writer, write_stream
from flink_table_store_spark.streaming.changelog import changelog_diff, input_changelog

__all__ = [
    "SnapshotStream",
    "foreach_batch_writer",
    "write_stream",
    "changelog_diff",
    "input_changelog",
]
