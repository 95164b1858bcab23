"""Continuous time-bucketed rollups as engine table state — the
hypertable / continuous-aggregate pattern (TimescaleDB continuous
aggregates, Druid rollup ingestion) on the engine's own merge machinery.

A rollup is a PRIMARY-KEY table keyed (bucket_start, group columns)
under the aggregation merge engine: appending a batch's PARTIAL
aggregates IS the refresh — no read-modify-write, no re-aggregation of
history, O(batch) incremental cost, and replay safety via the same
commit-identifier check every index family uses. Decomposable
aggregates only (count/sum/min/max — avg derives as sum/count at
read), which is exactly the restriction the published systems make.

At 100 TB: each refresh shuffles one batch down to its bucket x group
cells; queries read the rollup table (bucket-pruned like any PK table)
and never touch raw history.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FNS = {"count", "sum", "min", "max", "hll"}


def create_rollup_table(
    catalog,
    name: str,
    *,
    time_col: str,
    interval: str,
    group_cols: list[tuple[str, str]] | None = None,
    metrics: dict[str, tuple[str, str]],
    buckets: int = 4,
    source: str | None = None,
    ignore_if_exists: bool = False,
):
    """Create the rollup: PK (bucket_start, *group cols), one column
    per metric maintained server-side. ``metrics`` maps output name ->
    (source column, fn) or (source column, fn, dtype) with fn in
    count/sum/min/max. count('*') counts rows; count(col) counts
    NON-NULL values, exactly as direct SQL would. Default storage type
    is bigint for count and double otherwise — pass an explicit dtype
    (e.g. 'bigint' for exact integer sums past 2^53, 'decimal(20,2)',
    a timestamp for min/max over time) when double would lose the
    source's precision. The spec rides in table options so every
    refresher provably buckets and aggregates identically.

    ``source`` names the RAW engine table this rollup continuously
    aggregates: the link is recorded on BOTH tables
    (``rollup.source`` here, ``rollup.tables`` on the raw table) so
    SqlSession's opt-in rollup routing can rewrite in-spec aggregates
    over the raw table to the rollup — the read half of the
    continuous-aggregate pattern (TimescaleDB real-time aggregate
    query rewriting)."""
    group_cols = group_cols or []
    norm: dict[str, tuple] = {}
    for out, spec in metrics.items():
        src, fn = spec[0], spec[1]
        if fn not in _FNS:
            raise ValueError(
                f"metric {out}: fn must be one of {sorted(_FNS)}, got {fn!r}"
            )
        dtype = (
            spec[2] if len(spec) > 2
            else ("bigint" if fn == "count"
                  else "binary" if fn == "hll" else "double")
        )
        if fn == "hll" and dtype != "binary":
            raise ValueError(
                f"metric {out}: hll metrics are stored as binary "
                f"DataSketches HLL buffers, got dtype {dtype!r}"
            )
        norm[out] = (src, fn, dtype)
    metrics = norm
    cols = ["bucket_start timestamp"]
    cols += [f"{n} {t}" for n, t in group_cols]
    cols += [f"{out} {dt}" for out, (_s, _f, dt) in metrics.items()]
    opts = {
        "bucket": str(buckets),
        "merge-engine": "aggregation",
        "rollup.time-col": time_col,
        "rollup.interval": interval,
        "rollup.metrics": json.dumps(metrics),
    }
    for out, (_src, fn, _dt) in metrics.items():
        # count folds as a sum of partial counts; sum/min/max fold as
        # themselves; hll folds as a sketch UNION (merge_engines.py's
        # hll_sketch aggregator over binary fields) — all decomposable,
        # the continuous-aggregate rule. HLL is the one APPROXIMATE
        # metric: union of partials estimates identically to a
        # single-pass sketch (same lgK), so refresh batching never
        # changes the answer — but the SQL router never maps
        # count(DISTINCT) onto it (approximate != direct).
        opts[f"fields.{out}.aggregate-function"] = (
            "sum" if fn == "count"
            else "hll_sketch" if fn == "hll" else fn
        )
    if source:
        opts["rollup.source"] = source
    rollup = catalog.create_table(
        name,
        ", ".join(cols),
        primary_keys=["bucket_start"] + [n for n, _t in group_cols],
        options=opts,
        ignore_if_exists=ignore_if_exists,
    )
    if source:
        raw = catalog.get_table(source)
        known = [
            r for r in raw.schema.options.get("rollup.tables", "").split(",")
            if r
        ]
        if name not in known:
            raw.evolve_schema(
                [
                    {
                        "action": "set_option",
                        "key": "rollup.tables",
                        "value": ",".join(known + [name]),
                    }
                ]
            )
    return rollup


def _spec(rollup) -> tuple[str, str, dict]:
    opts = rollup.schema.options
    try:
        return (
            opts["rollup.time-col"],
            opts["rollup.interval"],
            json.loads(opts["rollup.metrics"]),
        )
    except KeyError as e:
        raise ValueError(f"not a rollup table: missing option {e}") from None


def update_rollup(
    rollup, batch: DataFrame, commit_identifier: str | None = None
) -> None:
    """Fold one batch of raw rows into the rollup: one map-combined
    groupBy to the batch's bucket x group cells, then an append the
    merge engine folds server-side. Identifier-checked exactly-once.
    Rows with a NULL timestamp are refused loudly (they have no bucket;
    silently dropping them would make the rollup disagree with a direct
    aggregation of the raw table)."""
    time_col, interval, metrics = _spec(rollup)
    pk = rollup.schema.primary_keys
    groups = [c for c in pk if c != "bucket_start"]
    aggs = []
    for out, spec in metrics.items():
        src, fn = spec[0], spec[1]
        dt = spec[2] if len(spec) > 2 else None
        if fn == "count":
            # count('*') = rows; count(col) = NON-NULL values, exactly
            # as a direct aggregation of the raw table would count
            agg = (
                F.count(F.lit(1)) if src == "*" else F.count(F.col(src))
            )
        elif fn == "hll":
            # partial sketch per cell; the merge engine UNIONS buffers
            agg = F.expr(f"hll_sketch_agg(`{src}`)")
            dt = None  # already binary
        else:
            agg = getattr(F, fn)(F.col(src))
        if dt:
            agg = agg.cast(dt)
        aggs.append(agg.alias(out))
    # NULL timestamps must be refused, in ONE pass: F.window silently
    # DROPS null-timestamp rows (the exact hazard), so nulls coalesce
    # to a year-0001 sentinel first — they collapse into one impossible
    # bucket the post-aggregation check (over <= cells + 1 rows) can
    # see. A dedicated pre-scan would read the batch twice; real event
    # time before year 100 is out of contract.
    sentinel = F.lit("0001-01-01 00:00:00").cast(
        batch.schema[time_col].dataType.simpleString()
    )
    rows = (
        batch.groupBy(
            F.window(F.coalesce(F.col(time_col), sentinel), interval)[
                "start"
            ].alias("bucket_start"),
            *[F.col(g) for g in groups],
        )
        .agg(*aggs)
    )
    try:
        rows = rows.localCheckpoint(eager=True)
    except Exception:
        pass  # optimization only: the check re-runs the agg lineage
    if rows.where(F.col("bucket_start") < F.lit("0100-01-01")).limit(1).count():
        raise ValueError(
            f"batch has rows with NULL {time_col}: no bucket to fold into"
        )
    rollup.refresh().write(rows, commit_identifier=commit_identifier or "")


def refresh_rollup_incremental(spark, rollup, source) -> dict:
    """Fold exactly the SOURCE rows committed since the last incremental
    refresh — continuous-aggregate maintenance driven by the source
    table's own snapshots (TimescaleDB refresh policies / Druid
    auto-compaction, but exact): the last-refreshed snapshot rides in
    the rollup's options, the delta is one ``incremental_read`` of
    ``(last, latest]``, and the fold's commit identifier encodes the
    RANGE so every crash window self-heals:

    * crash after the fold commit but before the option advance — the
      next call derives the range end from the committed identifier
      (``rollup-incr:<from>:to:<end>``) and advances the option FIRST,
      so new source commits can never be double-folded (commit-order
      replay derivation, the curation-writer / global-index protocol);
    * replay with no new source commits — the identifier-checked fold
      is a no-op;
    * crash before the fold commit — nothing happened.

    Insert-only contract: the source must be an append table (a PK
    update's delta row would ADD to sum/count cells that already hold
    the key's old contribution); PK sources are refused — feed those
    through ``rollup_stream`` over the changelog instead. Do not mix
    manual ``update_rollup`` batches with incremental refreshes of the
    same rows (disjoint identifiers cannot deduplicate each other).

    Returns ``{"from": a, "to": b, "folded": bool}``."""
    if source.is_primary_key_table():
        raise ValueError(
            "refresh_rollup_incremental requires an append (insert-only) "
            "source: a PK update's delta would double-fold the key's old "
            "contribution; maintain from the changelog via rollup_stream "
            "instead"
        )
    opts = rollup.schema.options
    last = int(opts.get("rollup.source-snapshot", "0"))
    prefix = f"rollup-incr:{last}:to:"
    # the crashed fold is necessarily a recent rollup commit, so the
    # heal scan is bounded (newest-first); like the engine's own
    # commit-identifier dedup, the protocol assumes snapshot retention
    # outlives the retry horizon — don't expire snapshots faster than
    # a crashed refresher could plausibly come back
    for sid in reversed(rollup.snapshots.snapshot_ids()[-200:]):
        ident = rollup.snapshots.load(sid).commit_identifier
        if ident.startswith(prefix):
            # a previous refresh folded this range but died before
            # advancing the option: complete its bookkeeping first
            healed = int(ident[len(prefix):])
            rollup.evolve_schema([
                {"action": "set_option", "key": "rollup.source-snapshot",
                 "value": str(healed)},
            ])
            rollup = rollup.refresh()
            last = healed
            break
    latest = source.snapshots.latest_id()
    if latest is None or latest <= last:
        return {"from": last, "to": last, "folded": False}
    batch = source.incremental_read(spark, last, latest, scan_mode="delta")
    update_rollup(
        rollup, batch, commit_identifier=f"rollup-incr:{last}:to:{latest}"
    )
    rollup.evolve_schema([
        {"action": "set_option", "key": "rollup.source-snapshot",
         "value": str(latest)},
    ])
    return {"from": last, "to": latest, "folded": True}


def rollup_avg(sum_col: str, count_col: str):
    """avg = sum/count at read — the derived aggregate the storage
    never needs to hold."""
    return F.try_divide(F.col(sum_col), F.col(count_col))


def rollup_distinct(hll_col: str):
    """Distinct-count estimate of an ``hll`` metric at the rollup's own
    grain — ``hll_sketch_estimate`` over the stored (already-unioned)
    buffer."""
    return F.expr(f"hll_sketch_estimate(`{hll_col}`)")


def rollup_distinct_at(hll_col: str):
    """AGGREGATE form for re-graining: union the cells' sketches under
    any coarser GROUP BY, then estimate — e.g.
    ``df.groupBy(date_trunc('week', bucket_start)).agg(
    rollup_distinct_at('uniques'))``. Union is associative and
    idempotent on HLL buffers, so the weekly estimate equals what a
    single-pass weekly sketch would report (same lgK)."""
    return F.expr(f"hll_sketch_estimate(hll_union_agg(`{hll_col}`, true))")


def rollup_stream(
    stream: DataFrame,
    rollup,
    sink_id: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Maintain a rollup from a streaming feed: each micro-batch folds
    its partial aggregates with an identifier derived from the batch id
    — Structured Streaming owns offsets/retries, the identifier check
    makes every refresh exactly-once (a replayed batch is a no-op, so
    the sum-aggregated cells can never double-count)."""

    def _fold(df: DataFrame, batch_id: int) -> None:
        update_rollup(
            rollup, df, commit_identifier=f"{sink_id}:{batch_id}"
        )

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_fold)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
