"""Deterministic sampling operators for training-mix construction.

Training-data pipelines sample per stratum (language, source domain,
quality band) to hit a target mix. Random sampling is not reproducible
across runs/engines; these operators order by a PORTABLE deterministic
key — ``md5(key || '-' || seed)`` — so the same (corpus, seed) always
yields the same sample, on Spark or any ANSI engine (the DuckDB oracle
replicates the selection exactly).

Scale design:

- ``hash_fraction_sample`` — deterministic Bernoulli by hash
  threshold: a narrow filter, no shuffle at all. Approximate-n; the
  100 TB default.
- ``stratified_sample`` — EXACT n per stratum. The naive form is one
  window sort per stratum — a full per-stratum sort, unusable when a
  stratum holds billions of rows. With ``prefilter`` (default) the
  selection first counts strata (one map-combined agg), broadcasts a
  per-stratum hash threshold oversampling by ``safety``×, filters
  narrowly to ~safety·n candidates per stratum, and only THEN sorts —
  the window runs on O(n) rows per stratum, not O(stratum). The
  threshold keeps selection identical (the exact sample is the n
  smallest hashes; the prefilter keeps every hash below a bound that
  provably contains them — checked, with a loud fallback to the full
  sort if the oversample was too tight).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(key_col: str | Column, seed: int = 42) -> Column:
    """Portable deterministic order key: md5 of ``key || '-' || seed``
    (hex string — identical on any engine with md5; xxhash64 would be
    Spark-only)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(F.concat_ws("-", c.cast("string"), F.lit(str(seed))))


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic ~``fraction`` Bernoulli sample: keep rows whose
    hex order key sorts below the fraction threshold. Narrow filter —
    zero shuffle, reproducible across engines."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    # compare on the first 15 hex digits (60 bits) as an integer
    bound = int(fraction * float(1 << 60))
    return df.where(
        F.conv(F.substring(sample_key(key_col, seed), 1, 15), 16, 10).cast(
            "bigint"
        )
        < F.lit(bound)
    )


def resample_to_mix(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    token_col: str,
    total_tokens: int | None = None,
    key_col: str = "doc_id",
    seed: int = 42,
    max_repeat: int = 100,
) -> DataFrame:
    """Resample a corpus to a target per-domain TOKEN mix — the
    training-mixture construction step (e.g. 60% web / 30% code /
    10% academic). Every row gains a ``copy`` column (0..k-1); domains
    above their target are deterministically downsampled, domains
    below it are upsampled by repetition.

    Per domain d with current token count ``T_d``: the budget is
    ``B*w_d`` tokens (``B`` = ``total_tokens`` or the corpus total),
    so each row repeats ``f = B*w_d/T_d`` times — ``floor(f)`` copies
    plus one more when the row's uniform hash falls below ``frac(f)``
    (deterministic Bernoulli, engine-portable via md5). Expected token
    mass per domain is exactly the target; ``max_repeat`` guards a
    tiny domain from exploding the output.

    Scale: one map-combined groupBy over domains (the per-domain
    totals broadcast back as a literal map), then a narrow
    ``posexplode`` — no join, no second shuffle. Domains absent from
    ``weights`` are dropped (weight 0)."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.sum(F.col(token_col).cast("double")))
        .collect()
    }
    budget = float(
        total_tokens
        if total_tokens is not None
        else sum(v for v in totals.values() if v)
    )
    wsum = float(sum(weights.values()))
    factors = {}
    for d, t_d in totals.items():
        w = weights.get(d, 0.0) / wsum if wsum else 0.0
        f = (budget * w / t_d) if t_d else 0.0
        if f > max_repeat:
            raise ValueError(
                f"domain {d!r} needs repeat factor {f:.1f} > max_repeat="
                f"{max_repeat}; raise max_repeat or lower its weight"
            )
        factors[d] = f
    # base of the when-chain is 0.0 so rows whose domain matches no
    # branch — including NULL domains, where every `col == d` compares
    # to null — get factor 0 and are dropped, per the weight-0 contract
    fcol: Column = F.lit(0.0)
    for d, f in factors.items():
        if d is None:
            continue
        fcol = F.when(F.col(domain_col) == d, F.lit(float(f))).otherwise(fcol)
    base = F.floor(fcol).cast("int")
    frac = fcol - F.floor(fcol)
    # uniform in [0,1): first 15 hex digits of the portable hash key
    u = F.conv(F.substring(sample_key(key_col, seed), 1, 15), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 60))
    n_copies = base + (u < frac).cast("int")
    out = df.withColumn("__n_copies", n_copies).where(F.col("__n_copies") > 0)
    return out.select(
        "*",
        F.posexplode(
            F.array_repeat(F.lit(0), F.col("__n_copies"))
        ).alias("copy", "__z"),
    ).drop("__n_copies", "__z")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    seed: int = 42,
    prefilter: bool = True,
    safety: float = 4.0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum: the n smallest
    deterministic hash keys. Reproducible and engine-portable (ties
    are impossible for distinct keys; equal keys tie-break on
    ``key_col``)."""
    okey = sample_key(key_col, seed).alias("__okey")
    base = df.select("*", okey)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("__okey"), F.col(key_col))
    )

    def _pick(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n_per_stratum)
            .drop("__rn", "__okey")
        )

    if not prefilter:
        return _pick(base)
    counts = base.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # per-stratum candidate bound: keep hashes in the smallest
    # safety*n/N fraction (floor at 1.0 when n*safety >= N). Hash keys
    # are uniform hex, so the bound holds w.h.p.; correctness does NOT
    # depend on it — strata whose candidate count came up short of
    # min(n, N) fall back to the full sort.
    frac = F.least(
        F.lit(1.0), F.lit(float(n_per_stratum) * safety) / F.col("__n")
    )
    bounds = counts.select(
        strata_col,
        F.col("__n"),
        (frac * F.lit(float(1 << 60))).cast("bigint").alias("__bound"),
    )
    cand = base.join(F.broadcast(bounds), strata_col).where(
        F.conv(F.substring("__okey", 1, 15), 16, 10).cast("bigint")
        <= F.col("__bound")
    )
    # shortfall is computed from `counts` (every stratum), not from
    # `cand`: a stratum whose prefilter yields ZERO candidates (e.g.
    # duplicate key values all hashing above the bound) must still take
    # the loud full-sort fallback rather than vanish from the output
    cand_counts = cand.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    short = (
        counts.join(cand_counts, strata_col, "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)))
        .where(F.col("__c") < F.least(F.lit(n_per_stratum), F.col("__n")))
        .select(strata_col)
    )
    retry = [r[0] for r in short.collect()]
    picked = _pick(cand.drop("__n", "__bound"))
    if retry:
        # oversample missed for these strata (adversarially non-uniform
        # key distribution): exact full-sort fallback, loud in the plan
        full = _pick(base.join(F.broadcast(short), strata_col, "semi"))
        picked = picked.join(
            F.broadcast(short), strata_col, "anti"
        ).unionByName(full)
    return picked


def split_dataset(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    group_col: str | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: add ``split_col``
    labeling each row by where md5(key ∥ '-' ∥ seed) lands among the
    cumulative ``splits`` fractions (insertion order; fractions must
    sum to ~1). With ``group_col`` the hash is taken over the GROUP
    key instead — every row of a group (a domain, a near-dup cluster,
    a repository) lands in the SAME split, the leakage guard that
    random row-level splits miss: without it, near-duplicate documents
    straddle train and test and evaluation silently measures
    memorization. NULL groups hash as the string 'NULL' (one group).

    Scale: a narrow projection — zero shuffle, zero driver state; the
    same (corpus, seed, splits) labels identically on any engine."""
    if not splits:
        raise ValueError("splits must be non-empty")
    fracs = list(splits.items())
    if any(f < 0 for _, f in fracs):
        raise ValueError(f"negative split fraction in {splits}")
    total = sum(f for _, f in fracs)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    hkey = F.coalesce(
        F.col(group_col or key_col).cast("string"), F.lit("NULL")
    )
    u = F.conv(
        F.substring(sample_key(hkey, seed), 1, 15), 16, 10
    ).cast("bigint")
    expr, acc = None, 0.0
    # the last split takes everything above its lower bound, so the
    # full 60-bit range is covered regardless of FP rounding in sums
    for name, frac in fracs[:-1]:
        acc += frac
        bound = int(acc * float(1 << 60))
        cond = u < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(fracs[-1][0])
    label = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, label)


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    token_col: str | None = None,
) -> dict[str, float]:
    """Temperature-scaled domain sampling weights — the multilingual /
    multi-source mixing rule (T5, XLM-R: sample domain d with
    probability ∝ p_d^τ, τ∈(0,1]). τ=1 keeps natural proportions;
    τ→0 approaches uniform, boosting small domains without the
    degenerate oversampling a hard uniform mix causes. ``p_d`` is the
    domain's share of rows (or of ``token_col`` mass when given).
    Returns normalized weights ready for ``resample_to_mix`` — the
    composition is the classic two-step: measure, rescale, resample.
    One map-combined groupBy; NULL domains are excluded (they carry
    weight 0 downstream, resample_to_mix's documented contract)."""
    if not 0.0 < temperature <= 1.0:
        # validate BEFORE the corpus aggregation: a bad argument must
        # not cost a full scan to surface
        raise ValueError(
            f"temperature must be in (0, 1], got {temperature}"
        )
    mass = (
        F.sum(F.col(token_col).cast("double"))
        if token_col
        else F.count(F.lit(1)).cast("double")
    )
    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(domain_col).agg(mass).collect()
        if r[0] is not None and r[1]
    }
    return temperature_weights_from_totals(totals, temperature)


def temperature_weights_from_totals(
    totals: dict[str, float], temperature: float
) -> dict[str, float]:
    """The driver math of ``temperature_weights`` over a precomputed
    {domain: mass} table — shared with the corpus-stats index, whose
    state IS those totals (no corpus scan to re-measure)."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(
            f"temperature must be in (0, 1], got {temperature}"
        )
    totals = {d: t for d, t in totals.items() if d is not None and t}
    if not totals:
        raise ValueError("no non-NULL domains with positive mass")
    all_mass = sum(totals.values())
    scaled = {d: (t / all_mass) ** temperature for d, t in totals.items()}
    z = sum(scaled.values())
    return {d: s / z for d, s in scaled.items()}


def unimax_allocation(
    df: DataFrame,
    domain_col: str,
    budget: float,
    max_epochs: float = 1.0,
    token_col: str | None = None,
) -> dict[str, dict[str, float]]:
    """UniMax budget allocation (Chung et al., ICLR 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): spread a total training ``budget``
    (tokens, or rows when ``token_col`` is None) as uniformly as
    possible across domains, but never take more than ``max_epochs``
    passes over any domain's data. The published water-filling rule:
    repeatedly give every still-open domain an equal share; domains
    whose capacity ``max_epochs * n_d`` is below their share are
    frozen at capacity; the leftover re-spreads over the rest.

    Closed form used here (and replayed exactly by the SQL oracle):
    sort domains by capacity ascending; domain i (1-based, k total,
    prefix capacity cum_{i-1}) is capped iff
    ``c_i * (k - i + 1) <= budget - cum_{i-1}``; the first uncapped
    domain fixes the uniform share ``u = (budget - cum_m) / (k - m)``
    and every later domain gets ``u`` too (capacities are sorted, so
    cappedness is monotone).

    One map-combined groupBy; the per-domain table is driver-sized
    (domains, not rows). Returns {domain: {mass, capacity, alloc,
    weight, epochs}} with ``weight`` = alloc / Σ alloc ready for
    ``resample_to_mix``. NULL domains are excluded (weight-0
    downstream, the resample_to_mix contract)."""
    if budget <= 0:
        # validate BEFORE the corpus aggregation, as temperature_weights
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    mass_expr = (
        F.sum(F.col(token_col).cast("double"))
        if token_col
        else F.count(F.lit(1)).cast("double")
    )
    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(domain_col).agg(mass_expr).collect()
        if r[0] is not None and r[1]
    }
    return unimax_allocation_from_totals(totals, budget, max_epochs)


def unimax_allocation_from_totals(
    totals: dict[str, float], budget: float, max_epochs: float = 1.0
) -> dict[str, dict[str, float]]:
    """The closed-form water-filling of ``unimax_allocation`` over a
    precomputed {domain: mass} table — shared with the corpus-stats
    index, whose state IS those totals."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    totals = {d: t for d, t in totals.items() if d is not None and t}
    if not totals:
        raise ValueError("no non-NULL domains with positive mass")
    # ascending capacity, domain name as deterministic tie-break
    order = sorted(totals, key=lambda d: (max_epochs * totals[d], d))
    k, cum, u = len(order), 0.0, None
    out = {}
    for i, d in enumerate(order, start=1):
        cap = max_epochs * totals[d]
        if u is None and cap * (k - i + 1) <= budget - cum:
            out[d] = cap
            cum += cap
        else:
            if u is None:
                u = (budget - cum) / (k - i + 1)
            out[d] = u
    alloc_sum = sum(out.values())
    return {
        d: {
            "mass": totals[d],
            "capacity": max_epochs * totals[d],
            "alloc": out[d],
            "weight": out[d] / alloc_sum,
            "epochs": out[d] / totals[d],
        }
        for d in order
    }


# ---------------------------------------------------------------------------
# corpus-stats index: mixture totals as engine-native table state
# ---------------------------------------------------------------------------

STATS_INDEX_DDL = "domain string, n bigint, tokens bigint"
# NULL domains fold under a sentinel no real domain string can collide
# with (U+0000 prefix), so a genuine ''-named domain keeps its own row
# and the index-vs-scan mixture parity holds for it
NULL_DOMAIN = "\x00null"


def create_corpus_stats_index(catalog, name: str, *, buckets: int = 1):
    """Persistent per-domain corpus totals as an engine PK table under
    the sum-aggregation merge engine: appending a batch's (domain,
    count, token-sum) deltas IS the update — no read-modify-write, no
    corpus scan. The state the mixture rules (temperature, UniMax)
    consume is this table, so re-balancing a 100 TB corpus reads
    O(domains) rows instead of re-measuring anything."""
    return catalog.create_table(
        name,
        STATS_INDEX_DDL,
        primary_keys=["domain"],
        options={
            "bucket": str(buckets),
            "merge-engine": "aggregation",
            "fields.n.aggregate-function": "sum",
            "fields.tokens.aggregate-function": "sum",
        },
    )


def update_corpus_stats_index(
    index,
    batch,
    domain_col: str = "lang",
    token_col: str | None = None,
    commit_identifier: str | None = None,
) -> None:
    """Fold one batch's per-domain deltas into the stats index: one
    map-combined groupBy, <= |domains| rows written. NULL domains fold
    under the NULL_DOMAIN sentinel so counts stay complete while the
    mixture rules keep excluding them (a genuine empty-string domain
    keeps its own row, matching the scan paths). Identifier-checked exactly-once,
    like every index family."""
    toks = (
        F.sum(F.col(token_col).cast("bigint"))
        if token_col
        else F.lit(None).cast("bigint")
    )
    rows = batch.groupBy(
        F.coalesce(
            F.col(domain_col).cast("string"), F.lit(NULL_DOMAIN)
        ).alias("domain")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        toks.alias("tokens"),
    )
    index.refresh().write(rows, commit_identifier=commit_identifier or "")


def totals_from_stats_index(
    spark, index, token_weighted: bool = False
) -> dict[str, float]:
    """The {domain: mass} table the mixture rules take, straight from
    index state — O(domains) rows read, no corpus scan. Feed to
    ``temperature_weights_from_totals`` / ``unimax_allocation_from_totals``;
    the NULL_DOMAIN sentinel is excluded, matching the scan paths'
    NULL exclusion (empty-string domains pass through on both)."""
    col = "tokens" if token_weighted else "n"
    return {
        r["domain"]: float(r[col])
        for r in index.refresh().to_df(spark).collect()
        if r["domain"] != NULL_DOMAIN and r[col]
    }


def sample_weighted_exact(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact and deterministic —
    the Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters 2006):
    each row draws the key ln(u)/w with u a deterministic md5 uniform
    of its id, and the k LARGEST keys are the sample (equivalently
    u^(1/w); the log form avoids pow underflow at large weights).
    Inclusion probabilities follow successive weighted draws without
    replacement, the classic reservoir semantics.

    Rows with NULL or non-positive weight are excluded (zero weight =
    never drawn; a negative weight has no sampling meaning). Selection
    goes through ``exact_top_k`` — no global sort, no partition-less
    window, no P·k driver merge — and the md5 uniforms make the sample
    reproducible on any engine (the correctness oracle replays it)."""
    from flink_table_store_spark.datapipe.dsir import exact_top_k

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(sample_key(key_col, seed), 1, 15), 16, 10).cast(
            "bigint"
        )
        + F.lit(1)
    ).cast("double") / F.lit(float((1 << 60) + 2))
    keyed = df.where(w.isNotNull() & (w > 0)).withColumn(
        "__es", F.log(u) / w
    )
    return exact_top_k(keyed, "__es", k, tie_col=key_col).drop("__es")
