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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
            failed += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            failed += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            failed += 1
            continue
        sm, om = df_multiset([c.lower() for c in scols], srows), df_multiset(
            [c.lower() for c in ocols], orows
        )
        if len(sm) != len(om):
            print(f"FAIL  {name}: row count spark={len(sm)} oracle={len(om)}")
            failed += 1
            continue
        diffs = [(a, b) for a, b in zip(sm, om) if a != b]
        if diffs:
            print(f"FAIL  {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
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
            failed += 1
        else:
            print(f"PASS  {name}: {len(sm)} rows")
            passed += 1
    print(f"\n== {passed} passed, {failed} failed, {skipped} rows-only ==")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
