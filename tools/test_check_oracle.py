#!/usr/bin/env python3
"""Unit tests for check_oracle.py's compare gate — pins the round-12
hardening: non-numeric-vs-float and date-like-VARCHAR-vs-timestamp
pairings must FAIL (they are oracle typing bugs the driver's exact-type
compare rejects), legitimate coercions (parquet DECIMAL→float, DATE
object→datetime) must still pass, and setup failures must report, not
traceback.

Run: python3 tools/test_check_oracle.py   (wired into tools/ci.sh)
"""
import decimal
import importlib.util
import io
import json
import os
import sys
import tempfile
from contextlib import redirect_stdout

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(HERE, "check_oracle.py"))
co = importlib.util.module_from_spec(spec)
spec.loader.exec_module(co)

_TMPDIR = tempfile.TemporaryDirectory(prefix="check_oracle_test.")
_SEQ = [0]

# Self-contained SF fixture: a 1-row parquet per TABLES name is all view
# setup needs (every test oracle SELECTs from VALUES, never the tables).
# Round-13 ADVICE: the previous hardcoded /root/testdata/sf0.001 made the
# whole self-test SETUP-ERROR on any machine lacking that fixture.
SF = os.path.join(_TMPDIR.name, "sf")
os.makedirs(SF)
for _t in co.TABLES:
    pd.DataFrame({"x": [1]}).to_parquet(os.path.join(SF, f"{_t}.parquet"))

failures = []


def check(name, cond, detail=""):
    if cond:
        print(f"  ok: {name}")
    else:
        failures.append(name)
        print(f"FAIL: {name} {detail}")


def run_case(frames: dict, oracle: dict, sf: str = SF):
    """frames: {query_name: DataFrame written as its Spark dump}."""
    _SEQ[0] += 1
    out = os.path.join(_TMPDIR.name, f"case{_SEQ[0]}")
    for name, df in frames.items():
        os.makedirs(f"{out}/{name}")
        df.to_parquet(f"{out}/{name}/part.parquet")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump(oracle, f)
    buf = io.StringIO()
    with redirect_stdout(buf):
        code = co.main(out, sf)
    return code, buf.getvalue()


# 1. exact match passes; value drift fails
code, out = run_case(
    {"q1_vals": pd.DataFrame({"v": [1.5, 2.5]})},
    {"q1_vals": "SELECT * FROM (VALUES (1.5), (2.5)) t(v)"})
check("exact float match passes", code == 0, out)
code, out = run_case(
    {"q1_vals": pd.DataFrame({"v": [1.5, 2.5]})},
    {"q1_vals": "SELECT * FROM (VALUES (1.5), (2.6)) t(v)"})
check("float drift fails with maxdiff", code == 1 and "maxdiff" in out, out)

# 2. int-vs-float dtype gate (the round-6 q62 class)
code, out = run_case(
    {"q2_int": pd.DataFrame({"n": pd.array([3], dtype="int64")})},
    {"q2_int": "SELECT sum(x) AS n FROM (VALUES (1), (2)) t(x)"})
check("HUGEINT-coerced float vs int64 fails the dtype gate",
      code == 1 and "DTYPE KIND" in out, out)

# 3. round-12: VARCHAR-vs-float must fail, not astype into a false pass
code, out = run_case(
    {"q3_str": pd.DataFrame({"v": [1.5, 2.5]})},
    {"q3_str": "SELECT * FROM (VALUES ('1.5'), ('2.5')) t(v)"})
check("numeric-string vs float fails", code == 1 and "non-numeric" in out,
      out)

# 4. round-12: date-like VARCHAR vs timestamp must fail
code, out = run_case(
    {"q4_ts": pd.DataFrame(
        {"ts": pd.to_datetime(["2020-01-01", "2020-01-02"])})},
    {"q4_ts": "SELECT * FROM (VALUES ('2020-01-01'), ('2020-01-02')) t(ts)"})
check("date-like string vs timestamp fails",
      code == 1 and "non-date" in out, out)

# 5. legitimate coercions still pass: DATE (object-of-date vs datetime64)
# and DECIMAL (float-coerced) against Spark doubles/timestamps
code, out = run_case(
    {"q5_date": pd.DataFrame(
        {"d": pd.to_datetime(["2020-01-06"])})},
    {"q5_date": "SELECT DATE '2020-01-06' AS d"})
check("DATE vs timestamp midnight still passes", code == 0, out)
code, out = run_case(
    {"q6_dec": pd.DataFrame({"v": [1.5]})},
    {"q6_dec": "SELECT CAST(1.5 AS DECIMAL(10,2)) AS v"})
check("DECIMAL vs double still passes", code == 0, out)

# 5b. round-13: numericish must inspect ALL non-null values, not just the
# first — a mixed object column whose FIRST value is a Decimal but whose
# later values are numeric-looking strings is the false-pass class the
# float-coercion gate exists to reject (tested directly: parquet/duckdb
# both refuse to materialize a mixed-type column end-to-end)
check("all-Decimal object column is numericish",
      co.numericish(pd.Series([decimal.Decimal("1.5"),
                               decimal.Decimal("2.5")], dtype=object)))
check("Decimal-then-string mixed column is NOT numericish",
      not co.numericish(pd.Series([decimal.Decimal("1.5"), "2.5"],
                                  dtype=object)))
check("bool poses as int but is NOT numericish",
      not co.numericish(pd.Series([1.5, True], dtype=object)))
check("nulls are ignored, empty is numericish",
      co.numericish(pd.Series([None, 1.5], dtype=object))
      and co.numericish(pd.Series([], dtype=object)))

# 5c. round-14: numpy scalars do not subclass Python int/float but ARE
# real numbers — an object column of np.int64 paired against a float
# column is legitimately coercible and must not read as 'non-numeric vs
# float'. np.bool_ is not registered as numbers.Real, so it stays
# rejected like Python bool.
check("np.int64 object column is numericish",
      co.numericish(pd.Series([np.int64(1), np.int64(2)], dtype=object)))
check("np.float32 object column is numericish",
      co.numericish(pd.Series([np.float32(1.5)], dtype=object)))
check("np.bool_ is NOT numericish",
      not co.numericish(pd.Series([np.int64(1), np.bool_(True)],
                                  dtype=object)))
# np.timedelta64 subclasses np.signedinteger (so it IS numbers.Real) but
# astype(float) yields the raw tick count — a duration-vs-number oracle
# typing bug must stay a FAIL, not coerce into a value match
check("np.timedelta64 is NOT numericish",
      not co.numericish(pd.Series([np.timedelta64(5, "s")], dtype=object)))

# 6. round-12: setup failures report, never traceback
buf = io.StringIO()
with redirect_stdout(buf):
    code = co.main(os.path.join(_TMPDIR.name, "nowhere"), "/no_such_sf_dir")
check("missing sf dir / outdir reports SETUP ERROR and exits 1",
      code == 1 and "SETUP ERROR" in buf.getvalue(), buf.getvalue())

print()
if failures:
    print(f"{len(failures)} FAILED: {failures}")
    sys.exit(1)
print("test_check_oracle: all pass")
