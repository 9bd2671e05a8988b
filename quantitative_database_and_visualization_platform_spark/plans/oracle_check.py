"""Local mirror of the driver's correctness gate: run each registered
query on Spark AND its DuckDB oracle on the same parquet tables, compare
row count, column names, and values (order-insensitive).

Used by tests/test_oracle_parity.py and by `python -m
quantitative_database_and_visualization_platform_spark.plans.oracle_check`.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ..sources.catalog import TABLES


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.to_numpy()
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                diffs = [
                    f"row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
                    f" (Δ={abs((av.iloc[i] or 0) - (bv.iloc[i] or 0)) if not (math.isnan(av.iloc[i]) or math.isnan(bv.iloc[i])) else 'nan'})"
                    for i in bad
                ]
                problems.append(f"col {c}: {(~eq).sum()} value mismatches; e.g. {diffs}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                diffs = [f"row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}" for i in bad]
                problems.append(f"col {c}: {(~eq).sum()} value mismatches; e.g. {diffs}")
    return problems


def check_query(spark, sf_dir: str, name: str) -> list[str]:
    from . import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops: must produce data
        return [] if len(sdf) > 0 else ["rows-only query returned 0 rows"]
    odf = run_oracle(sf_dir, ORACLES[name])
    return compare(sdf, odf)


def main() -> None:  # pragma: no cover
    import sys

    from ..session import get_spark
    from . import ORACLES, QUERIES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")
    failed = 0
    for name in only:
        try:
            problems = check_query(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        status = "OK" if not problems else "FAIL"
        if problems:
            failed += 1
        extra = "" if name in ORACLES else " (rows-only, no oracle)"
        print(f"[{status}] {name}{extra}")
        for p in problems:
            print(f"       {p}")
    print(f"{len(only) - failed}/{len(only)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":  # pragma: no cover
    main()
