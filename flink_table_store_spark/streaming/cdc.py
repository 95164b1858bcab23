"""CDC ingestion (SURVEY §2.1 S21): changelog envelopes → PK-table upserts.

The reference ships MySQL/Kafka/Mongo CDC pipelines with automatic
schema evolution (paimon-flink/paimon-flink-cdc; RichCdcSinkBuilder,
``SchemaEvolution`` in cdc/ sink classes). Spark-first equivalent: the
transport is whatever Structured Streaming source the user runs (Kafka,
files); this module supplies

- envelope parsers for the two dominant wire formats, Debezium-JSON and
  Canal-JSON, as declarative ``from_json`` transforms. Payloads parse
  into ``map<string,string>`` so a *schema-free* stream still parses —
  column typing happens against the TABLE schema, and unseen keys drive
  schema evolution instead of being dropped;
- ``cdc_apply``: align a row-kind-tagged batch to the table schema
  (auto ``add_column`` for new fields, NULL-fill for missing, cast per
  target type) and upsert it;
- ``cdc_foreach_batch``: the exactly-once streaming glue (identifier-
  checked commits, same as streaming/sink.py).

Row-kind mapping (RowKind.java:35-56): inserts/snapshot-reads → ``+I``,
update-after → ``+U``, deletes → ``-D``. Update-before rows are not
materialized — PK upsert semantics make them redundant (the reference's
CDC sinks do the same for primary-key tables).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_table_store_spark.schema import ROW_KIND

_DEBEZIUM_SCHEMA = (
    "op string, ts_ms bigint, before map<string,string>, after map<string,string>"
)
# Canal packs multi-row batches: data/old are arrays of row-maps
_CANAL_SCHEMA = "type string, es bigint, data array<map<string,string>>, old array<map<string,string>>"


def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Debezium-JSON envelope → (_row_kind, payload map) rows.

    op ``c``/``r`` (create/snapshot-read) → +I with ``after``;
    ``u`` → +U with ``after``; ``d`` → -D with ``before``.
    """
    env = df.select(
        F.from_json(F.col(value_col).cast("string"), _DEBEZIUM_SCHEMA).alias("e")
    )
    return (
        env.where(F.col("e.op").isin("c", "r", "u", "d"))
        .select(
            F.when(F.col("e.op").isin("c", "r"), F.lit("+I"))
            .when(F.col("e.op") == "u", F.lit("+U"))
            .otherwise(F.lit("-D"))
            .alias(ROW_KIND),
            F.when(F.col("e.op") == "d", F.col("e.before"))
            .otherwise(F.col("e.after"))
            .alias("payload"),
        )
        .where(F.col("payload").isNotNull())
    )


def parse_canal(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Canal-JSON envelope → (_row_kind, payload map) rows (one output
    row per element of the ``data`` array)."""
    env = df.select(F.from_json(F.col(value_col).cast("string"), _CANAL_SCHEMA).alias("e"))
    return (
        env.where(F.col("e.type").isin("INSERT", "UPDATE", "DELETE"))
        .select(
            F.when(F.col("e.type") == "INSERT", F.lit("+I"))
            .when(F.col("e.type") == "UPDATE", F.lit("+U"))
            .otherwise(F.lit("-D"))
            .alias(ROW_KIND),
            F.explode(F.col("e.data")).alias("payload"),
        )
        .where(F.col("payload").isNotNull())
    )


def _payload_keys(parsed: DataFrame) -> list[str]:
    """Distinct payload keys — a tiny driver-side aggregate over key
    sets (O(distinct keys), not O(rows)); this is the schema-evolution
    probe, same role as the reference's per-record schema comparison."""
    [row] = (
        parsed.select(F.explode(F.map_keys("payload")).alias("k"))
        .agg(F.collect_set("k").alias("ks"))
        .collect()
    )
    return sorted(row.ks or [])


def cdc_apply(
    table,
    parsed: DataFrame,
    schema_evolution: bool = True,
    new_column_type: str = "string",
    commit_identifier: str = "",
):
    """Apply a parsed (_row_kind, payload map) batch to a PK table.

    Unknown payload keys evolve the schema (``add_column`` as nullable
    ``new_column_type``); known columns cast from their string wire form
    to the table type (Catalyst cast matrix — CastExecutors.java:38
    analogue); absent columns land NULL, which partial-update/agg merge
    engines treat as "no change".
    """
    schema = table.schema
    if schema_evolution:
        known = set(schema.field_names())
        fresh = [k for k in _payload_keys(parsed) if k not in known]
        if fresh:
            schema = table.evolve_schema(
                [{"action": "add_column", "name": k, "type": new_column_type} for k in fresh]
            )
    cols = [
        F.col("payload").getItem(f.name).cast(f.type).alias(f.name)
        for f in schema.fields
    ]
    batch = parsed.select(*cols, F.col(ROW_KIND))
    return table.write(
        batch, row_kind_col=ROW_KIND, commit_identifier=commit_identifier
    )


def cdc_file_stream(
    spark,
    table,
    source_dir: str,
    sink_id: str,
    checkpoint_dir: str,
    parser: Callable[[DataFrame], DataFrame] = parse_debezium,
    schema_evolution: bool = True,
    available_now: bool = True,
):
    """File-based CDC connector (S21): tail a directory of Debezium/Canal
    JSON-line files with Structured Streaming and apply each micro-batch
    via parse → evolve → upsert with identifier-checked exactly-once
    commits. The container-compatible analogue of the reference's
    kafka_sync_table pipeline (paimon-flink-cdc KafkaSyncTableAction) —
    swap the `text` source for `kafka` and NOTHING else changes.

    Returns the started StreamingQuery; with ``available_now`` the query
    drains everything currently in the directory and stops.
    """
    stream = spark.readStream.format("text").load(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            cdc_foreach_batch(table, sink_id, parser, schema_evolution)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_source_available(spark) -> bool:
    """True iff the spark-sql-kafka package is on the session classpath
    (it is an add-on jar, not part of core Spark)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def cdc_kafka_stream(
    spark,
    table,
    bootstrap_servers: str,
    topic: str,
    sink_id: str,
    checkpoint_dir: str,
    parser: Callable[[DataFrame], DataFrame] = parse_debezium,
    schema_evolution: bool = True,
    starting_offsets: str = "earliest",
    available_now: bool = False,
):
    """Kafka CDC connector (S21): consume a Debezium/Canal topic with
    Structured Streaming and apply micro-batches through the SAME
    parse → evolve → upsert loop as ``cdc_file_stream`` — the kafka
    frame's ``value`` column is what the parsers already read, so the
    only difference is the source format (the one-line swap SURVEY S21
    promises; reference: paimon-flink-cdc KafkaSyncTableAction /
    RichCdcMultiplexRecord pipeline).

    Requires the ``spark-sql-kafka-0-10`` package on the classpath;
    probe with ``kafka_source_available(spark)`` first."""
    if not kafka_source_available(spark):
        raise RuntimeError(
            "kafka source not on classpath — start the session with "
            "spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or use cdc_file_stream"
        )
    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    writer = stream.writeStream.foreachBatch(
        cdc_foreach_batch(table, sink_id, parser, schema_evolution)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_foreach_batch(
    table,
    sink_id: str,
    parser: Callable[[DataFrame], DataFrame] = parse_debezium,
    schema_evolution: bool = True,
) -> Callable[[DataFrame, int], None]:
    """``writeStream.foreachBatch`` function: parse → evolve → upsert,
    exactly-once via identifier-checked commits (T10)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parser(batch_df)
        cdc_apply(
            table,
            parsed,
            schema_evolution=schema_evolution,
            commit_identifier=f"{sink_id}:{batch_id}",
        )

    return apply
