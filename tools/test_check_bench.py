#!/usr/bin/env python3
"""Unit tests for check_bench.py's artifact comparison — in particular the
short-id collision-drift repair (round-12 ADVICE): a registry gaining a
query whose first '_'-segment collides with a previously-unique name must
not silently drop the old query from the gate.

Run: python3 tools/test_check_bench.py   (exit 0 = all pass; wired into
tools/ci.sh so the gate's own gate is part of every CI run)
"""
import importlib.util
import io
import json
import os
import sys
import tempfile
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "check_bench", os.path.join(HERE, "check_bench.py"))
cb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cb)


# one tempdir for every fixture, removed on interpreter exit — this runs
# in every ci.sh invocation and must not accumulate orphans in /tmp
_TMPDIR = tempfile.TemporaryDirectory(prefix="check_bench_test.")
_SEQ = [0]


def artifact(doc: dict) -> str:
    _SEQ[0] += 1
    path = os.path.join(_TMPDIR.name, f"a{_SEQ[0]}.json")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def run(prev: dict, new: dict, threshold: float = 2.0):
    out = io.StringIO()
    with redirect_stdout(out):
        code = cb.main(artifact(prev), artifact(new), threshold)
    return code, out.getvalue()


failures = []


def check(name, cond, detail=""):
    if cond:
        print(f"  ok: {name}")
    else:
        failures.append(name)
        print(f"FAIL: {name} {detail}")


# 1. plain full-name comparison: regression flagged, clean pass exits 0
code, out = run({"queries": {"q01_cond_agg": 1.0, "q44_trades_etl": 2.0}},
                {"queries": {"q01_cond_agg": 1.05, "q44_trades_etl": 2.1}})
check("clean full-vs-full exits 0", code == 0, out)
code, out = run({"queries": {"q01_cond_agg": 1.0, "q44_trades_etl": 2.0}},
                {"queries": {"q01_cond_agg": 5.0, "q44_trades_etl": 2.1}})
check("regression full-vs-full exits 1", code == 1, out)
check("regression names the query", "REGRESSION q01_cond_agg" in out, out)

# 2. the ADVICE scenario: new side is a compact wrapper that KEPT two full
# names because a new query collided with a previously-unique segment; the
# full-name prev side must not shorten the old name past it
prev_full = {"queries": {"q44_trades_etl": 1.0, "q01_cond_agg": 2.0}}
new_short = {"queries": {"q44_trades_etl": 1.05, "q44_new_thing": 0.5,
                         "q01": 2.0},
             "ids": "first_name_segment"}
code, out = run(prev_full, new_short)
check("drift-repaired comparison exits 0 when clean", code == 0, out)
check("repaired key stays in common (2 compared)",
      "compared 2 queries" in out, out)
# and the repaired key is genuinely measured: regress it and the gate fires
new_short_regressed = {"queries": {"q44_trades_etl": 9.0,
                                   "q44_new_thing": 0.5, "q01": 2.0},
                       "ids": "first_name_segment"}
code, out = run(prev_full, new_short_regressed)
check("repaired key's regression is flagged", code == 1, out)
check("flag names the full key", "REGRESSION q44_trades_etl" in out, out)

# 3. same repair with the sides swapped (prev is the compact wrapper)
prev_short = {"queries": {"q44_trades_etl": 1.0, "q44_new_thing": 0.5,
                          "q01": 2.0},
              "ids": "first_name_segment"}
new_full = {"queries": {"q44_trades_etl": 9.0, "q44_new_thing": 0.5,
                        "q01_cond_agg": 2.0}}
code, out = run(prev_short, new_full)
check("swapped-sides repair still compares 3 and flags 1",
      code == 1 and "compared 3 queries" in out, out)

# 4. residual AMBIGUOUS drift (short side has only the bare id, full side
# has two colliding full names — unrepairable) must be loud and counted,
# not silently intersected away
prev_amb = {"queries": {"q44": 1.0, "q01": 2.0},
            "ids": "first_name_segment"}
new_amb = {"queries": {"q44_trades_etl": 1.0, "q44_new_thing": 0.5,
                       "q01_cond_agg": 2.0}}
code, out = run(prev_amb, new_amb)
check("ambiguous drift exits nonzero", code > 0, out)
check("ambiguous drift prints KEY-DRIFT", "KEY-DRIFT" in out, out)
check("one stranded query counts ONCE even against two colliding names",
      code == 1, f"exit {code}: {out}")

# 4b. a missing artifact path must exit 255 (selection error), never 1
# (which the contract reads as one regression)
out = io.StringIO()
try:
    with redirect_stdout(out):
        cb.main(os.path.join(_TMPDIR.name, "no_such.json"),
                artifact({"queries": {"q01_cond_agg": 1.0}}))
    check("missing path exits via _die", False, "no SystemExit raised")
except SystemExit as e:
    check("missing path exits 255, not 1", e.code == 255, out.getvalue())

# 4c. round-13 ADVICE: a bare key in a FULL-NAME artifact (no short-ids
# mark) cannot be collision drift — it was never shortened. A removed
# query plus an unrelated new query sharing a qNN prefix must pass a
# clean gate, not fail it.
code, out = run({"queries": {"q44": 1.0, "q01_cond_agg": 2.0}},
                {"queries": {"q44_new_thing": 0.5, "q01_cond_agg": 2.0}})
check("bare key in unmarked artifact is NOT drift",
      code == 0 and "KEY-DRIFT" not in out, out)
# (a marked bare id that genuinely strands — the full side holding TWO
# colliding names — still counts: that is test 4 above)

# 5. a genuinely added/removed query (no segment collision) is NOT drift
code, out = run({"queries": {"q01_cond_agg": 1.0}},
                {"queries": {"q01_cond_agg": 1.0, "q99_brand_new": 3.0}})
check("plain added query is not drift", code == 0 and "KEY-DRIFT" not in out,
      out)

# 6. round-13: history_min_total rides along as context — printed when
# present (bare line or driver wrapper's parsed map), never flagged, and
# never mistaken for a query key by the regex fallback
code, out = run({"queries": {"q01_cond_agg": 1.0}, "history_min_total": 63.0},
                {"parsed": {"queries": {"q01_cond_agg": 1.1},
                            "ids": "first_name_segment",
                            "history_min_total": 63.71},
                 "tail": "truncated..."})
check("history_min_total printed for both sides, exit stays 0",
      code == 0 and "prev history_min_total: 63.000s" in out
      and "new history_min_total: 63.710s" in out, out)
check("history_min_total is not compared as a query",
      "compared 1 queries" in out, out)
# a malformed value must print as unparseable, never traceback (exit 1
# would read as one regression)
code, out = run({"queries": {"q01_cond_agg": 1.0},
                 "history_min_total": "storm"},
                {"queries": {"q01_cond_agg": 1.1}})
check("malformed history_min_total is reported, gate stays clean",
      code == 0 and "unparseable" in out, out)
# round-14 ADVICE: bool passes float() (float(True) == 1.0) and would
# print as '1.000s' — it is a malformed value, not one second
code, out = run({"queries": {"q01_cond_agg": 1.0},
                 "history_min_total": True},
                {"queries": {"q01_cond_agg": 1.1}})
check("bool history_min_total is unparseable, not 1.000s",
      code == 0 and "unparseable (True)" in out
      and "1.000s" not in out, out)

# 7. round-14 ADVICE: a wrapper whose `parsed` is null carries the ids
# mark only in its tail text — the regex-fallback path must still mark
# the doc as short-ids, so drift involving that artifact is judged
# against the right key style. Here the wrapper's tail kept
# q44_trades_etl FULL (its round had a q44 collider, truncated out of
# the tail), while the other side's round shortened the same segment to
# bare q44: ambiguous collision drift that must be flagged, not
# silently normalized into a pairing (the pre-fix behavior shortened
# the unmarked wrapper side and quietly compared q44_trades_etl as
# q44).
wrapper_null_parsed = {
    "parsed": None,
    "tail": ('"q07_rank_window":1.0,"q07_other_thing":0.5,'
             '"q44_trades_etl":1.2},"ids":"first_name_segment",'
             '"unit":"sec"')}
short_line = {"queries": {"q44": 1.2, "q07_rank_window": 1.0,
                          "q07_other_thing": 0.5},
              "ids": "first_name_segment"}
code, out = run(wrapper_null_parsed, short_line)
check("null-parsed wrapper is recognized as short-ids via its tail",
      code == 1 and "KEY-DRIFT" in out, out)
check("the unambiguous full-name keys still compare (2 compared)",
      "compared 2 queries" in out, out)

# 8. round-14: storm-suspect context line — one side measured under a
# >1.5x ambient load gets called out, without touching the exit code;
# near-equal loads stay silent, and a bool/zero load_median never
# qualifies as a comparable value
code, out = run({"queries": {"q01_cond_agg": 1.0}, "load_median": 1.8},
                {"queries": {"q01_cond_agg": 1.1}, "load_median": 4.1})
check("storm-suspect line printed for the noisy side, exit stays 0",
      code == 0 and "storm-suspect line: new" in out
      and "4.10" in out, out)
code, out = run({"queries": {"q01_cond_agg": 1.0}, "load_median": 2.0},
                {"queries": {"q01_cond_agg": 1.1}, "load_median": 2.4})
check("near-equal load medians stay silent",
      code == 0 and "storm-suspect" not in out, out)
code, out = run({"queries": {"q01_cond_agg": 1.0}, "load_median": True},
                {"queries": {"q01_cond_agg": 1.1}, "load_median": 4.1})
check("bool load_median is not a comparable value",
      code == 0 and "storm-suspect" not in out, out)
# the wrapper shape carries load_median inside `parsed`
code, out = run({"queries": {"q01_cond_agg": 1.0}, "load_median": 4.2},
                {"parsed": {"queries": {"q01_cond_agg": 1.1},
                            "load_median": 1.9},
                 "tail": "truncated..."})
check("parsed-wrapper load_median is read; prev is the suspect side",
      code == 0 and "storm-suspect line: prev" in out, out)
# a min-merged history side is judged by its QUIETEST merged line: a
# stormy LAST line whose sibling was quiet is an absorbed storm (the
# per-query mins came from the quiet window) and must stay silent...
hist_path = os.path.join(_TMPDIR.name, "hist_absorbed.jsonl")
with open(hist_path, "w") as f:
    f.write(json.dumps({"round": 5, "sf": "sf0.1", "load_median": 1.9,
                        "queries": {"q01_cond_agg": 1.0}}) + "\n")
    f.write(json.dumps({"round": 5, "sf": "sf0.1", "load_median": 4.8,
                        "queries": {"q01_cond_agg": 1.4}}) + "\n")
out = io.StringIO()
with redirect_stdout(out):
    code = cb.main(hist_path, artifact(
        {"queries": {"q01_cond_agg": 1.1}, "load_median": 2.0,
         "sf": "sf0.1"}))
check("absorbed storm in a min-merged history side stays silent",
      code == 0 and "storm-suspect" not in out.getvalue(), out.getvalue())
# ...while a history side whose EVERY merged window was stormy is
# genuinely suspect, cited with quietest-line provenance
hist_path2 = os.path.join(_TMPDIR.name, "hist_all_storm.jsonl")
with open(hist_path2, "w") as f:
    f.write(json.dumps({"round": 5, "sf": "sf0.1", "load_median": 4.4,
                        "queries": {"q01_cond_agg": 1.0}}) + "\n")
    f.write(json.dumps({"round": 5, "sf": "sf0.1", "load_median": 5.2,
                        "queries": {"q01_cond_agg": 1.4}}) + "\n")
out = io.StringIO()
with redirect_stdout(out):
    code = cb.main(hist_path2, artifact(
        {"queries": {"q01_cond_agg": 1.1}, "load_median": 2.0,
         "sf": "sf0.1"}))
check("all-stormy history side is suspect, cites quietest-line provenance",
      code == 0 and "storm-suspect line: prev" in out.getvalue()
      and "4.40 (quietest of 2 min-merged lines)" in out.getvalue(),
      out.getvalue())

# 8b. round-15 ADVICE: an explicit null inside `parsed` must not shadow a
# valid top-level scalar — the wrapper shape where the driver's sampler
# had no reading ("load_median": null in parsed) but the outer doc carries
# the real value previously skipped the storm-suspect context line.
code, out = run({"queries": {"q01_cond_agg": 1.0}, "load_median": 1.8},
                {"parsed": {"queries": {"q01_cond_agg": 1.1},
                            "load_median": None},
                 "load_median": 4.1, "tail": "truncated..."})
check("null in parsed falls through to top-level load_median",
      code == 0 and "storm-suspect line: new" in out and "4.10" in out, out)
# same fall-through for history_min_total context
code, out = run({"queries": {"q01_cond_agg": 1.0}},
                {"parsed": {"queries": {"q01_cond_agg": 1.1},
                            "history_min_total": None},
                 "history_min_total": 57.12, "tail": "truncated..."})
check("null in parsed falls through to top-level history_min_total",
      code == 0 and "new history_min_total: 57.120s" in out, out)
# and a genuine value inside parsed still wins over a stale top-level one
code, out = run({"queries": {"q01_cond_agg": 1.0}},
                {"parsed": {"queries": {"q01_cond_agg": 1.1},
                            "history_min_total": 57.12},
                 "history_min_total": 99.9, "tail": "truncated..."})
check("non-null parsed scalar still takes precedence",
      code == 0 and "new history_min_total: 57.120s" in out
      and "99.900s" not in out, out)

# 9. round-14 review: bare short-id keys in a MARKED tail are extracted
# by the fallback — without this, the majority key shape of a
# null-parsed wrapper never entered the gate at all, and a 10x
# regression in a bare-keyed query compared as 'clean'
bare_wrapper = {
    "parsed": None,
    "tail": ('"q44":9.9,"q01_cond_agg":2.0},"ids":"first_name_segment",'
             '"repaired":["q44"],"unit":"sec"')}
code, out = run({"queries": {"q44_trades_etl": 1.0,
                             "q01_cond_agg": 2.0}}, bare_wrapper)
check("bare key from a marked tail is extracted and its regression flagged",
      code == 1 and "REGRESSION q44" in out, out)
check("bare extraction still compares the full-name key too (2 compared)",
      "compared 2 queries" in out, out)
# ...and an UNMARKED raw text's bare qNN tokens are not keys
code, out = run({"queries": {"q44_trades_etl": 1.0}},
                {"parsed": None, "tail": '"q44":9.9,"q44_trades_etl":1.0}'})
check("bare token in an unmarked tail is NOT extracted",
      code == 0 and "compared 1 queries" in out, out)

print()
if failures:
    print(f"{len(failures)} FAILED: {failures}")
    sys.exit(1)
print("test_check_bench: all pass")
