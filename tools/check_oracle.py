"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle SQL side-by-side, compare row count + sorted
value multiset. Usage: python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("T", " ").replace("+00:00", "")
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(norm(r[i]) for i in order) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


_INTEGRAL = {"tinyint", "smallint", "int", "bigint", "integer", "long", "short", "byte"}


def dtype_drift(sdf, con, sql):
    """Return a description of int<->float kind drift between the Spark
    schema and a pandas fetch of the oracle, or None. Columns with NULLs
    are skipped (pandas legitimately promotes nullable ints to float on
    both sides).

    Deliberately RE-EXECUTES the oracle for a .df() fetch: the row
    comparison must keep fetchall() (dates/decimals normalize as python
    scalars there; a pandas fetch would change their repr and break the
    established norm() semantics), while drift detection only exists in
    the pandas dtype — one result set cannot serve both."""
    try:
        odf = con.execute(sql).df()
    except Exception:
        return None
    skind = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
    out = []
    for c in odf.columns:
        st = skind.get(c.lower())
        if st is None:
            continue
        col = odf[c]
        if col.isna().any():
            continue
        ok = col.dtype.kind  # 'i'/'u'/'f'/'O'...
        s_int = st in _INTEGRAL
        s_flt = st in ("float", "double")
        if s_int and ok == "f":
            out.append(f"{c}: spark {st} vs oracle pandas float64 (cast oracle ::BIGINT)")
        elif s_flt and ok in ("i", "u"):
            out.append(f"{c}: spark {st} vs oracle pandas int (cast oracle ::DOUBLE)")
    return "; ".join(out) or None


def _res(rows_match=False, schema_match=False, hash_match=False,
         spark_rows=None, oracle_rows=None, err=None):
    return {
        "rows_match": rows_match, "schema_match": schema_match,
        "hash_match": hash_match, "spark_rows": spark_rows,
        "oracle_rows": oracle_rows, "err": err,
    }


def main():
    # --json <path>: also write a CORRECTNESS_r{N}-shaped artifact
    # (REGISTRY_rN.json at round close) so the judge's full-registry
    # tail run is a file diff, not a re-execution
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    from flink_table_store_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            results[name] = _res(err=f"spark: {type(ex).__name__}: {str(ex)[:200]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            results[name] = {"rows_only": True, "spark_rows": len(srows), "err": None}
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            results[name] = _res(spark_rows=len(srows), err=f"duckdb: {str(ex)[:200]}")
            failed += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            results[name] = _res(rows_match=True, schema_match=False,
                                 spark_rows=len(srows), oracle_rows=len(orows))
            failed += 1
            continue
        sm, om = df_multiset([c.lower() for c in scols], srows), df_multiset(
            [c.lower() for c in ocols], orows
        )
        if len(sm) != len(om):
            print(f"FAIL  {name}: row count spark={len(sm)} oracle={len(om)}")
            results[name] = _res(spark_rows=len(sm), oracle_rows=len(om))
            failed += 1
            continue
        diffs = [(a, b) for a, b in zip(sm, om) if a != b]
        if diffs:
            print(f"FAIL  {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            results[name] = _res(rows_match=True, schema_match=True,
                                 spark_rows=len(sm), oracle_rows=len(om))
            failed += 1
            continue
        # Driver-parity dtype check: the driver value-hashes a pandas
        # fetch, where DuckDB HUGEINT (un-cast sum(BIGINT)) lands as
        # float64 while Spark bigint stays int64 — values equal, hashes
        # differ (r9 split_train_eval regression). fetchall() above
        # yields python ints and masks it, so compare pandas kinds too.
        drift = dtype_drift(sdf, con, oracles[name])
        if drift:
            print(f"FAIL  {name}: pandas dtype drift (driver hash would differ): {drift}")
            results[name] = _res(rows_match=True, schema_match=True,
                                 spark_rows=len(sm), oracle_rows=len(om),
                                 err=f"dtype drift: {drift[:200]}")
            failed += 1
        else:
            print(f"PASS  {name}: {len(sm)} rows")
            results[name] = _res(rows_match=True, schema_match=True,
                                 hash_match=True, spark_rows=len(sm),
                                 oracle_rows=len(om))
            passed += 1
    print(f"\n== {passed} passed, {failed} failed, {skipped} rows-only ==")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(results, f, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
