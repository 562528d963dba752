#!/usr/bin/env python3
"""Validate a SqliteIO-written database with STOCK sqlite3 (driver-side
tooling; the product writer is pure JVM).

Usage: check_sqlite.py <produced.db> [<golden.db>]

Checks:
  1. PRAGMA integrity_check == 'ok' — stock sqlite validates the page
     structure, cell coverage, b-tree ordering, overflow chains.
  2. The table is readable via plain SQL.
  3. With a golden db: CREATE TABLE text, row count, and full row-by-row
     equality (in rowid order — both producers emit group-key order).
"""
import sqlite3
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    produced = sys.argv[1]
    golden = sys.argv[2] if len(sys.argv) > 2 else None

    # read-only URI open: plain connect() CREATES a missing path as an
    # empty db, silently masking "writer never produced the file" behind a
    # misleading no-tables FAIL and leaving a stray .db behind
    def connect_ro(path):
        return sqlite3.connect(f"file:{path}?mode=ro", uri=True)

    try:
        conn = connect_ro(produced)
        cur = conn.cursor()

        ok = cur.execute("PRAGMA integrity_check").fetchall()
    except sqlite3.Error as e:
        print(f"FAIL: cannot open {produced}: {e}")
        return 1
    if ok != [("ok",)]:
        print(f"FAIL: integrity_check: {ok}")
        return 1
    print("integrity_check: ok")

    tables = cur.execute(
        "SELECT name, sql FROM sqlite_master WHERE type='table'").fetchall()
    if len(tables) != 1:
        print(f"FAIL: expected exactly 1 table, got {tables}")
        return 1
    name, sql = tables[0]
    # identifier-quote the name defensively, and pin the scan to rowid
    # order (the docstring's contract) rather than planner whim
    def select_all(c, table):
        q = table.replace('"', '""')
        return c.execute(f'SELECT * FROM "{q}" ORDER BY rowid').fetchall()

    rows = select_all(cur, name)
    print(f"table '{name}': {len(rows)} rows readable")

    if golden:
        try:
            gconn = connect_ro(golden)
            gcur = gconn.cursor()
        except sqlite3.Error as e:
            print(f"FAIL: cannot open golden {golden}: {e}")
            return 1
        gtab = gcur.execute(
            "SELECT name, sql FROM sqlite_master WHERE type='table'").fetchone()
        if gtab is None:
            print(f"FAIL: golden {golden} has no tables")
            return 1
        gname, gsql = gtab
        grows = select_all(gcur, gname)
        if sql != gsql:
            print(f"FAIL: CREATE TABLE differs:\n  produced: {sql!r}\n  golden:   {gsql!r}")
            return 1
        print("CREATE TABLE text: byte-identical to golden")
        if len(rows) != len(grows):
            print(f"FAIL: row count {len(rows)} != golden {len(grows)}")
            return 1
        # repo float-parity rule (TradesEtlSpec golden): keys, counts and
        # null shape EXACT; float sums differ from pandas only by summation
        # order (partition-parallel vs file-order), tolerance 1e-9
        def cell_ok(a, b):
            if isinstance(a, float) and isinstance(b, float):
                return abs(a - b) <= 1e-9
            return a == b

        max_drift = 0.0
        bad = []
        for i, (a, b) in enumerate(zip(rows, grows)):
            if len(a) != len(b) or not all(cell_ok(x, y) for x, y in zip(a, b)):
                bad.append((i, a, b))
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    max_drift = max(max_drift, abs(x - y))
        if bad:
            i, a, b = bad[0]
            print(f"FAIL: {len(bad)} row mismatches; first at {i}:\n  {a}\n  {b}")
            return 1
        print(f"rows: all {len(rows)} match golden in order "
              f"(max float drift {max_drift:.2e}, summation-order ulps)")

    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
