#!/usr/bin/env python3
"""Measure the pandas reference pipeline (extract+clean+transform, the q44
scope) on the reference CSV and the scaled clones from graft.etl.TradesGen.

Usage: bench_baseline.py [csv ...]   (defaults to the three-scale set)

Imports the reference module from /root/reference with matplotlib stubbed
(same recipe as the original BASELINE.md measurement); reference files are
never written to. Prints one JSON line per input: rows, clean rows, agg
rows, best-of-3 wall seconds.
"""
import contextlib, io, json, os, sys, time, types

sys.modules.setdefault("matplotlib", types.ModuleType("matplotlib"))
sys.modules["matplotlib"].use = lambda *a, **k: None
plt = types.ModuleType("matplotlib.pyplot")
plt.__getattr__ = lambda name: (lambda *a, **k: None)
sys.modules.setdefault("matplotlib.pyplot", plt)

sys.path.insert(0, "/root/reference")
import etl_weekly_trades as ref  # noqa: E402

DEFAULT = [
    "/root/reference/trades (1) (2) (1).csv",
    "/root/repo/bench_data/trades_80k.csv",
    "/root/repo/bench_data/trades_800k.csv",
]


def pre_read(path):
    # Untimed warm of the page cache: this host's virtual disk reads
    # ~32 MB/s cold and its memory reclaim can evict cache between runs,
    # which would randomly fold a multi-second cold read into the pipeline
    # timing. The Spark side (graft.Bench) pre-reads identically, so both
    # engines are measured under the same warm-cache condition.
    with open(path, "rb") as f:
        while f.read(1 << 20):
            pass


def run_once(path):
    pre_read(path)
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(io.StringIO()):
        df = ref.extract(path)
        n_clean = len(df)
        agg = ref.transform(df, compute_pnl=True)
    return time.perf_counter() - t0, n_clean, len(agg)


def main(paths):
    for path in paths:
        runs = [run_once(path) for _ in range(3)]
        wall, n_clean, n_agg = min(runs, key=lambda r: r[0])
        n_raw = sum(1 for _ in open(path)) - 1
        print(json.dumps({
            "csv": os.path.basename(path), "input_rows": n_raw,
            "clean_rows": n_clean, "agg_rows": n_agg,
            "pandas_wall_sec": round(wall, 4),
            "rows_per_sec": round(n_raw / wall),
        }))


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
