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


@dataclass
class ObjectTable:
    """Metadata index over a directory of arbitrary objects
    (table/object/ObjectTable.java:34-46 — SCHEMA path/name/length/
    mtime/atime/owner). ``to_df`` is metadata-only: Spark's binaryFile
    source prunes the unselected ``content`` column, so listing a
    petabyte object store reads zero payload bytes; ``with_content``
    attaches payloads for the multimodal ingestion path."""

    name: str
    location: str
    options: dict[str, str] = field(default_factory=dict)

    def _reader(self, spark: SparkSession):
        reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
        glob = self.options.get("pathGlobFilter")
        if glob:
            reader = reader.option("pathGlobFilter", glob)
        return reader.load(self.location)

    def to_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        base = self.location.rstrip("/")
        raw = self._reader(spark)
        rel = F.regexp_replace(
            F.regexp_replace(F.col("path"), r"^file:", ""), re_escape_prefix(base), ""
        )
        mtime = (F.unix_timestamp(F.col("modificationTime")) * 1000).cast("bigint")
        return raw.select(
            rel.alias("path"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
            F.col("length").cast("bigint").alias("length"),
            mtime.alias("mtime"),
            # binaryFile exposes no atime/owner; mirror the reference's
            # nullable contract with mtime / null
            mtime.alias("atime"),
            F.lit(None).cast("string").alias("owner"),
        )

    def with_content(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        base = self.location.rstrip("/")
        raw = self._reader(spark)
        rel = F.regexp_replace(
            F.regexp_replace(F.col("path"), r"^file:", ""), re_escape_prefix(base), ""
        )
        return raw.select(
            rel.alias("path"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
            F.col("length").cast("bigint").alias("length"),
            (F.unix_timestamp(F.col("modificationTime")) * 1000).cast("bigint").alias("mtime"),
            F.col("content"),
        )


def re_escape_prefix(base: str) -> str:
    import re

    return "^" + re.escape(base) + "/?"
