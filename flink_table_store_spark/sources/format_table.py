"""Format tables + object tables (SURVEY §2.1 S9/S10 adjuncts).

- FormatTable (FormatTable.java:76-80, Format {ORC, PARQUET, CSV,
  TEXT, JSON}): a raw directory exposed as a table — pure
  ``spark.read.format(...)`` passthrough with options, registered in
  the catalog as a JSON descriptor (no snapshots/manifests).
- Object table (table/object/): a directory of arbitrary files as
  rows — ``spark.read.format("binaryFile")`` (path, modificationTime,
  length, content), the multimodal ingestion entry point.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "csv", "json", "text")


@dataclass
class FormatTable:
    name: str
    location: str
    format: str
    options: dict[str, str] = field(default_factory=dict)

    def to_df(self, spark: SparkSession) -> DataFrame:
        if self.format not in FORMATS:
            raise ValueError(f"unsupported format {self.format}")
        reader = spark.read.format(self.format)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.location)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        w = df.write.format(self.format).mode(mode)
        for k, v in self.options.items():
            w = w.option(k, v)
        w.save(self.location)


def object_table(spark: SparkSession, location: str, path_glob: str | None = None) -> DataFrame:
    """Files-as-rows: (path, modificationTime, length, content binary)."""
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(location)
