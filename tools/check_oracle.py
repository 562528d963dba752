#!/usr/bin/env python3
"""Self-check: mimic the driver's correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, runs each SQL in DuckDB with the sf tables
registered as views, loads the matching Spark parquet dump, sorts columns by
name and rows by all columns, and compares values exactly (reporting max
float deviation when not exact).
"""
import datetime, decimal, glob, json, numbers, sys
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def numericish(s: pd.Series) -> bool:
    """True when EVERY non-null value is a real number (int/float/Decimal/
    numpy scalar, not bool) — the condition under which astype(float) is a
    legitimate coercion (parquet DECIMAL, nullable floats). Checking only
    the first value let a mixed object column whose first value is numeric
    but whose later values are numeric-looking strings coerce into a false
    match — the exact class this gate targets (round-13 ADVICE).
    numbers.Real rather than a (int, float) tuple (round-14 ADVICE): numpy
    integer scalars (np.int64 etc.) do not subclass Python int but ARE
    registered as numbers.Integral, and an object column of numpy ints
    paired against a float column is legitimately coercible, not a FAIL.
    Decimal stays explicit — it is registered as numbers.Number but not
    numbers.Real. np.timedelta64 subclasses np.signedinteger (so it IS
    numbers.Real) but astype(float) on it yields the raw tick count — a
    duration-vs-number oracle typing bug must stay a FAIL, not coerce
    into a value match. Empty/all-null is numericish: there is nothing a
    coercion could falsify."""
    nn = s.dropna()
    return bool(nn.map(
        lambda v: isinstance(v, (numbers.Real, decimal.Decimal))
        and not isinstance(v, (bool, np.timedelta64))).all())


def canon(df: pd.DataFrame):
    """Column-sorted, row-sorted frame + its stringified twin (the twin
    doubles as the non-float compare key, so the frame is stringified once,
    not once for the sort and again per compared column)."""
    df = df.reindex(sorted(df.columns), axis=1)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return (df.loc[order].reset_index(drop=True),
            key.loc[order].reset_index(drop=True))


def main(outdir: str, sf: str) -> int:
    # guarded setup: a missing table parquet (DuckDB validates at CREATE
    # VIEW) or a corrupt oracle_sql.json must report a FAIL line like any
    # other failure, not abort the gate with a raw traceback before any
    # accounting is printed
    try:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    except Exception as e:
        print(f"SETUP ERROR: {type(e).__name__}: {e}")
        print("\nFAIL: 0/0 oracle queries match")
        return 1
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"{name}: COLUMN MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"{name}: ROW COUNT spark={len(spark_df)} duck={len(duck_df)}")
            failures += 1
            continue
        # guarded: an inconvertible dtype pairing (string-vs-double astype,
        # tz-aware-vs-naive datetime) must record ONE failure and move on —
        # exactly the oracle-typing-bug class this tool reports, so it must
        # not be the class that crashes the whole gate mid-run
        try:
            (a, akey), (b, bkey) = canon(spark_df), canon(duck_df)
            bad = []
            for c in a.columns:
                av, bv = a[c], b[c]
                # Dtype-kind gate BEFORE the tolerant float branch: DuckDB
                # sum(BIGINT) returns HUGEINT, which pandas coerces to float64 —
                # the old code then compared by value and masked exactly the
                # int-vs-float mismatch that the driver's hash check fails on
                # (round-6 q62). An integer column on one side and a float on
                # the other is a typing bug in the oracle SQL (missing CAST),
                # not a tolerance question.
                kinds = {av.dtype.kind, bv.dtype.kind}
                if "f" in kinds and kinds & {"i", "u"}:
                    bad.append(
                        f"{c} (DTYPE KIND spark={av.dtype} duck={bv.dtype}; "
                        "cast the oracle, e.g. CAST(sum(x) AS BIGINT))")
                    continue
                if "f" in kinds and len(kinds) > 1:
                    # same typing-bug class for the NON-int kinds the gate
                    # above misses: a VARCHAR '1.5' or BOOLEAN against a
                    # Spark double would astype(float) to a false match
                    # that the driver's type check fails. Object columns
                    # carrying plain numbers (parquet DECIMAL, nullable
                    # floats) remain legitimately coercible.
                    objside = av if av.dtype.kind != "f" else bv
                    if not numericish(objside):
                        bad.append(
                            f"{c} (DTYPE KIND spark={av.dtype} "
                            f"duck={bv.dtype}; non-numeric vs float — "
                            "cast the oracle)")
                        continue
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    av = av.astype(float); bv = bv.astype(float)
                    both = av.values.astype(float), bv.values.astype(float)
                    nan_a, nan_b = np.isnan(both[0]), np.isnan(both[1])
                    eq = (both[0] == both[1]) | (nan_a & nan_b)
                    if not eq.all():
                        # numeric deviation only over rows numeric on BOTH
                        # sides; NaN-vs-value mismatches counted separately
                        # (np.nanmax over an all-NaN diff printed
                        # 'maxdiff=nan' + an All-NaN-slice warning)
                        num = ~nan_a & ~nan_b & ~eq
                        nan_mismatch = int((nan_a ^ nan_b).sum())
                        parts = [f"n={int((~eq).sum())}"]
                        if num.any():
                            d = np.abs(both[0][num] - both[1][num]).max()
                            parts.insert(0, f"maxdiff={d:.3e}")
                        if nan_mismatch:
                            parts.append(f"nan_vs_value={nan_mismatch}")
                        bad.append(f"{c} ({', '.join(parts)})")
                else:
                    av_s, bv_s = akey[c], bkey[c]
                    if "datetime" in str(av.dtype) or "datetime" in str(bv.dtype):
                        # normalize only when BOTH sides hold date/datetime
                        # VALUES (datetime64, or object-of-date as pyarrow
                        # reads parquet DATE): an oracle returning date-like
                        # VARCHAR against a Spark timestamp would otherwise
                        # parse to a false match the driver fails
                        def dateish(s):
                            if "datetime" in str(s.dtype):
                                return True
                            nn = s.dropna()
                            return len(nn) == 0 or isinstance(
                                nn.iloc[0],
                                (datetime.date, datetime.datetime,
                                 pd.Timestamp))
                        if not (dateish(av) and dateish(bv)):
                            bad.append(
                                f"{c} (DTYPE KIND spark={av.dtype} "
                                f"duck={bv.dtype}; date/timestamp vs "
                                "non-date — cast the oracle)")
                            continue
                        av_s = pd.to_datetime(av).astype("datetime64[us]").astype(str)
                        bv_s = pd.to_datetime(bv).astype("datetime64[us]").astype(str)
                    eq = (av_s.values == bv_s.values)
                    if not eq.all():
                        i = int(np.argmax(~eq))
                        bad.append(f"{c} (first: {av.iloc[i]!r} != {bv.iloc[i]!r}, n={int((~eq).sum())})")
        except Exception as e:
            print(f"{name}: COMPARE ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if bad:
            print(f"{name}: VALUE MISMATCH rows={len(a)}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"{name}: OK ({len(a)} rows)")
    print(f"\n{'FAIL' if failures else 'PASS'}: {len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
