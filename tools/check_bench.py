#!/usr/bin/env python3
"""Bench-regression gate: diff two rounds' bench artifacts per query and
flag >THRESHOLD regressions, so harness pollution (round 7: accumulated
pinned localCheckpoint blocks degraded the late alphabet up to 45×) can
never ship silently again.

Usage: check_bench.py <prev_artifact> <new_artifact> [threshold]

Each artifact argument accepts any of FOUR shapes:
  - the driver's wrapper artifact (whose `tail` field holds the LAST
    ~2000 chars of the bench stdout line — the front of the queries object
    may be truncated, so only the per-query keys that survived compare),
  - the full one-line JSON / bench_detail.json written by graft.Bench
    (reps arrays are reduced to their min),
  - tools/bench_history.jsonl — the committed FULL per-query record
    appended after every run (the preferred reference: all ~106 keys
    survive, vs 25–63 in the truncated wrappers). Default: the last line;
    select a specific round with an `@N` suffix, e.g.
    `tools/bench_history.jsonl@9`.

Exit code: number of flagged regressions (0 = clean; 255 = the artifacts
share no query keys, i.e. the comparison never happened). A flagged query means
"re-measure it standalone in a fresh session before believing either
number" — the round-7 lesson is that the artifact, not the code, can be the
thing that regressed.
"""
import json, os, re, sys


def _die(msg: str):
    """255, never 1: the exit code means 'N flagged regressions', and a
    selection error must not read as one regression (same rationale as the
    no-common-keys path in main)."""
    print(msg)
    sys.exit(255)


def load_artifact(path: str, sf_hint: str = None):
    """Read an artifact once: (raw text, parsed dict or {}). A JSONL
    history file resolves to ONE round's record (the last line's round, or
    round N with an `@N` suffix), with that round's same-SF lines merged
    by per-query min — falling through to the whole-file regex would
    silently merge every round's keys, latest-line-wins, which reads as a
    comparison that never mixes rounds but does. `sf_hint` (the OTHER
    artifact's sf, when known) restricts the candidates first: every bench
    run appends to the history regardless of SF, and an sf0.01 smoke line
    chosen as the reference for an sf0.1 artifact would flag every query
    ~10x 'slower'."""
    sel = None
    if "@" in path and not os.path.exists(path):
        path, _, sel = path.rpartition("@")
    try:
        raw = open(path).read()
    except OSError as e:
        # 255, not an uncaught traceback's exit 1: the exit-code contract
        # is 'N flagged regressions', and a typo'd path must not read as
        # one regression
        _die(f"cannot read artifact {path}: {e}")
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = {}
        entries = []
        for line in raw.splitlines():
            if not line.strip():
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(d, dict) and isinstance(d.get("queries"), dict):
                entries.append(d)
        if sf_hint and any(d.get("sf") == sf_hint for d in entries):
            entries = [d for d in entries if d.get("sf") == sf_hint]
        if entries:
            if sel is not None:
                entries = [d for d in entries if str(d.get("round")) == sel]
                if not entries:
                    _die(f"no history entry for round {sel} in {path}"
                         + (f" at sf {sf_hint}" if sf_hint else ""))
            # a round with several official runs: merge its same-round
            # lines by per-query MIN (each line's value is already a hot
            # min-of-reps, so the smallest across runs is the cleanest
            # reference); without @N the MAX round present is the target
            # (mirroring BenchSupport.historyReference — a late-appended
            # re-run of an older round must not displace the latest one)
            if sel is None:
                target = max(d.get("round", 0) for d in entries)
                entries = [d for d in entries if d.get("round") == target]
            # merge only lines sharing the last line's sf: when sf_hint
            # was absent (the NEW-artifact load) the candidates can still
            # span SFs, and a cross-SF min would take the small-SF value
            # for every shared key — a chimera artifact that masks every
            # real regression at the large SF
            target_sf = entries[-1].get("sf")
            same = [d for d in entries if d.get("sf") == target_sf]
            doc = dict(same[-1])
            merged = {}
            src = {}  # query -> index of the line that supplied its min
            for li, d in enumerate(same):
                for k, v in d["queries"].items():
                    fv = float(v)
                    # skip the -1.0 failed-rep sentinel: one failed run
                    # must not poison a key that has a clean sibling value
                    if fv < 0:
                        continue
                    if k not in merged or fv < merged[k]:
                        merged[k] = fv
                        src[k] = li
            doc["queries"] = merged
            # evidence follows provenance: each key's twin_reps row and
            # load_flagged entries are taken from the SAME line that
            # supplied its merged min — copying them wholesale from the
            # last line would make the min-rep-flagged annotation describe
            # a different run than the one actually being gated on
            doc["twin_reps"] = {
                k: same[li]["twin_reps"][k]
                for k, li in src.items()
                if k in same[li].get("twin_reps", {})}
            doc["load_flagged"] = [
                f for li, d in enumerate(same)
                for f in d.get("load_flagged", [])
                if src.get(f.get("q")) == li]
            # how many lines fed the merge: context prints cite it, since
            # scalar fields (load_median etc.) describe only the LAST line
            # while the merged per-query values span all of them
            doc["_merged_n"] = len(same)
            # the QUIETEST merged line's ambient load: the min-merge draws
            # each key from its best window, so storm-suspicion of a merged
            # side must be judged against the calmest window it had — the
            # last line's load_median would brand an absorbed storm as
            # contaminating totals it never touched (round-14 review)
            lms = [float(d["load_median"]) for d in same
                   if isinstance(d.get("load_median"), (int, float))
                   and not isinstance(d.get("load_median"), bool)
                   and d["load_median"] > 0]
            if lms:
                doc["_load_median_min"] = min(lms)
            raw = json.dumps(doc)
    if sel is not None:
        # also reached when a ONE-line history file json-parses directly
        if not (isinstance(doc, dict) and doc.get("queries")):
            _die(f"@{sel} selector given but {path} is not a history file")
        if str(doc.get("round")) != sel:
            _die(f"no history entry for round {sel} in {path}")
    return raw, (doc if isinstance(doc, dict) else {})


SHORT_IDS_MARK = "first_name_segment"


def shorten_map(names) -> dict:
    """Mirror BenchSupport.shortIds: {full_name: short_id} where a name
    maps to its first '_'-segment and any group sharing a first segment
    keeps its full names."""
    first = {k: k.split("_", 1)[0] for k in names}
    counts = {}
    for s in first.values():
        counts[s] = counts.get(s, 0) + 1
    return {k: (s if counts[s] == 1 else k) for k, s in first.items()}


def shorten_keys(queries: dict) -> dict:
    """Apply shorten_map to a FULL-name query map so it can be compared
    against a compact wrapper line (whose keys are already short)."""
    m = shorten_map(queries)
    return {m[k]: v for k, v in queries.items()}


def extract_queries(raw: str, doc: dict) -> dict:
    """Return {query_name: seconds} from any of the artifact shapes.
    A second element of truth rides on the doc: `doc['_short_ids']` is set
    when the keys are compact short ids (see Bench's final stdout line)."""
    # driver wrapper whose parse succeeded (the compact line): queries live
    # under `parsed`, keyed by short ids when so marked
    p = doc.get("parsed")
    if isinstance(p, dict) and isinstance(p.get("queries"), dict):
        if p.get("ids") == SHORT_IDS_MARK:
            doc["_short_ids"] = True
        return {k: float(v) for k, v in p["queries"].items()}
    if isinstance(doc.get("queries"), dict):           # full bench line
        if doc.get("ids") == SHORT_IDS_MARK:
            doc["_short_ids"] = True
        return {k: float(v) for k, v in doc["queries"].items()}
    if isinstance(doc.get("reps"), dict):              # bench_detail.json
        # min over VALID reps only: -1.0 is the failed-rep sentinel,
        # and min() over the raw array would resolve any query with
        # one failed rep to -1 — silently excluding it from the gate
        return {k: min(x for x in v if x >= 0)
                for k, v in doc["reps"].items()
                if any(x >= 0 for x in v)}
    if isinstance(doc.get("tail"), str):               # driver wrapper
        raw = doc["tail"]
    # regex fallback over (possibly front-truncated) tail text. The ids
    # mark must be recognized HERE too (round-14 ADVICE): a wrapper whose
    # `parsed` is null carries its short-id keys only in the tail, and
    # leaving the doc unmarked made KEY-DRIFT's bare_is_short_side gate
    # silently skip genuine short-id collision drift in that shape.
    if f'"ids":"{SHORT_IDS_MARK}"' in raw:
        doc["_short_ids"] = True
    out = {}
    for m in re.finditer(r'"(q[0-9]+[a-z]?_[a-z0-9_]+)":(-?[0-9.]+)', raw):
        out[m.group(1)] = float(m.group(2))
    # bare short ids ("q44":9.9, no underscore) are the MAJORITY key shape
    # of a marked short-ids line — the full-name pattern above cannot see
    # them, which left most of a null-parsed wrapper's queries out of the
    # gate entirely (round-14 review: a 10x regression in a bare-keyed
    # query compared as 'clean' because the key was never extracted).
    # Only when marked: in full-name text a bare qNN token is not a key.
    if doc.get("_short_ids"):
        for m in re.finditer(r'"(q[0-9]+[a-z]?)":(-?[0-9.]+)', raw):
            out.setdefault(m.group(1), float(m.group(2)))
    return out


def scalar(doc: dict, key: str):
    """Read a context scalar with the wrapper precedence: the driver
    wrapper carries bench scalars inside `parsed` when its parse
    succeeded; bare bench lines / history docs carry them top-level."""
    p = doc.get("parsed")
    if isinstance(p, dict):
        # round-15 ADVICE: an explicit null INSIDE `parsed` (the driver
        # emits "load_median": null when its sampler had no reading) must
        # not shadow a valid top-level value — fall through instead of
        # returning the None that silently skips the context line.
        v = p.get(key)
        if v is not None:
            return v
    return doc.get(key)


def min_rep_flagged(doc: dict) -> set:
    """Query names whose MIN-producing rep was taken under a flagged load,
    from a round-9+ detail file's ambient-load record; empty for
    older/other artifact shapes. Only the argmin rep counts: a query with
    one stormed rep whose min came from a clean rep is a genuine
    measurement and must not be waved off as ambient."""
    flagged = {}
    for f in doc.get("load_flagged", []):
        flagged.setdefault(f["q"], set()).add(f["rep"])
    # committed history lines carry no full `reps` table but do carry the
    # twins' rep arrays (`twin_reps`) — use them, so a history-line
    # artifact's stormed-argmin twin still gets the ambient annotation
    rep_table = doc.get("reps") or doc.get("twin_reps") or {}
    out = set()
    for q, idxs in flagged.items():
        reps = rep_table.get(q, [])
        valid = [(v, i) for i, v in enumerate(reps) if v >= 0]
        if valid and min(valid)[1] in idxs:
            out.add(q)
    return out


def main(prev_path: str, new_path: str, threshold: float = 2.0) -> int:
    new_raw, new_doc = load_artifact(new_path)
    # the new artifact's sf (when it carries one) pins which history lines
    # are eligible as the reference — cross-SF mins are not comparable
    prev_raw, prev_doc = load_artifact(prev_path, new_doc.get("sf"))
    prev = extract_queries(prev_raw, prev_doc)
    new = extract_queries(new_raw, new_doc)
    # key-style normalization: when exactly one side is a compact
    # short-id map (a post-round-11 wrapper), shorten the full-name side
    # with the same deterministic rule so the comparison stays possible —
    # otherwise wrapper-vs-history would share no keys and exit 255
    new_key_map = None  # full name -> comparison key, when new was shortened
    if prev_doc.get("_short_ids") != new_doc.get("_short_ids"):
        # collision-drift repair: the short side derived its map from ITS
        # OWN population, so a name unique there may collide in the full
        # side's population (or vice versa). Shortening the full side with
        # only its own counts would then give the two sides different keys
        # for the SAME query and silently drop it from `common`. Where the
        # short side kept a FULL name (it contains '_') that the full side
        # also has, pin that name to itself instead of shortening it.
        if prev_doc.get("_short_ids"):
            new_key_map = shorten_map(new)
            for t in prev:
                if "_" in t and t in new:
                    new_key_map[t] = t
            new = {new_key_map[k]: v for k, v in new.items()}
        else:
            m = shorten_map(prev)
            for t in new:
                if "_" in t and t in prev:
                    m[t] = t
            prev = {m[k]: v for k, v in prev.items()}
    # Surface each side's `history_min_total` (round-13: the session/history
    # min-merged total Bench publishes NEXT TO the noisy face value, so a
    # storm-landed driver snapshot is self-contextualizing). Context only —
    # never enters the flag count; the per-query min-merge above is the gate.
    for label, doc in (("prev", prev_doc), ("new", new_doc)):
        hmt = scalar(doc, "history_min_total")
        if hmt is None:
            continue
        # context must never crash the gate: a malformed value would
        # traceback to exit 1, which the contract reads as ONE regression.
        # bool is explicitly malformed (round-14 ADVICE): float(True) is
        # 1.0, so without the guard a boolean would print as '1.000s'
        # instead of being flagged as unparseable.
        try:
            if isinstance(hmt, bool):
                raise TypeError("bool is not a seconds value")
            print(f"{label} history_min_total: {float(hmt):.3f}s "
                  "(session/history min-merged representative total)")
        except (TypeError, ValueError):
            print(f"{label} history_min_total: unparseable ({hmt!r})")
    # Storm-suspect annotation (round-14): when one side's ambient
    # load_median is >1.5x the other's, its face values were taken under
    # a host storm and the totals are not comparable like-for-like — say
    # so, so the printout itself explains face-value divergence the way
    # history_min_total explains the representative number. Context only:
    # never enters the flag count or the exit code.
    lm = {}
    for label, doc in (("prev", prev_doc), ("new", new_doc)):
        # a min-merged history side is judged by its QUIETEST merged
        # line: the per-query mins were drawn from the best windows, so
        # its last line's load says nothing about the merged values —
        # branding an absorbed storm as suspect would tell the reader to
        # distrust exactly the totals that already fixed it
        v = doc.get("_load_median_min")
        if v is None:
            v = scalar(doc, "load_median")
        if isinstance(v, (int, float)) and not isinstance(v, bool) and v > 0:
            lm[label] = float(v)
    if len(lm) == 2 and max(lm.values()) > 1.5 * min(lm.values()):
        noisy = max(lm, key=lm.get)
        mn = (prev_doc if noisy == "prev" else new_doc).get("_merged_n", 1)
        prov = f" (quietest of {mn} min-merged lines)" if mn > 1 else ""
        print(f"storm-suspect line: {noisy} ran at load_median "
              f"{lm[noisy]:.2f}{prov}, >1.5x the other side's "
              f"{min(lm.values()):.2f} — face-value totals are not "
              f"like-for-like; trust the min-merge and history_min_total")
    common = sorted(set(prev) & set(new))
    if not common:
        # 255, not 1: the exit code otherwise means "N regressions", and a
        # comparison that never happened must not read as "one regression"
        print("no common query keys between the two artifacts")
        return 255
    ambient = min_rep_flagged(new_doc)
    # the ambient set carries FULL names (detail/history evidence); when
    # the new side's keys were shortened for the comparison, map the
    # ambient names through the SAME population-derived map — otherwise
    # the load-flagged annotation silently never matches and a storm
    # reads as a genuine regression (exactly what the annotation exists
    # to prevent). Names outside the queries map pass through unchanged.
    if new_key_map is not None:
        ambient = {new_key_map.get(q, q) for q in ambient}
    flagged = 0
    # floor of 0.25 s: at sub-quarter-second scale a 2x ratio is scheduler
    # noise, not a regression worth a standalone re-measure
    for k in common:
        a, b = prev[k], new[k]
        if a <= 0 or b <= 0:
            continue
        if b > threshold * a and b > 0.25:
            note = (" [min rep load-flagged in-artifact: likely ambient, "
                    "re-measure before believing]" if k in ambient else "")
            print(f"REGRESSION {k}: {a:.3f}s -> {b:.3f}s ({b / a:.1f}x){note}")
            flagged += 1
    both = [(k, prev[k], new[k]) for k in common if prev[k] > 0 and new[k] > 0]
    tp = sum(a for _, a, _ in both)
    tn = sum(b for _, _, b in both)
    ratio = f"{tn / tp:.2f}x" if tp > 0 else "n/a (no valid pairs)"
    print(f"compared {len(common)} queries; common-key totals "
          f"{tp:.1f}s -> {tn:.1f}s ({ratio}); flagged {flagged} "
          f"(> {threshold}x and > 0.25s)")
    only_prev = sorted(set(prev) - set(new))
    only_new = sorted(set(new) - set(prev))
    # residual short-id drift: a bare short id on one side whose first
    # segment matches a FULL name stranded on the other side means the
    # same query is (probably) comparing under two different keys — the
    # repair above couldn't resolve it (the short side is ambiguous about
    # which full name it meant). That query would otherwise pass the gate
    # unmeasured, so it COUNTS AS FLAGGED: re-run with full-name artifacts
    # (tools/bench_history.jsonl) to compare it for real. The bare id must
    # come from a side MARKED as short-ids (round-13 ADVICE): a bare key in
    # a full-name artifact was never shortened, so it cannot be collision
    # drift — pairing it would fail an otherwise clean gate when a genuinely
    # removed query and an unrelated new one share a qNN prefix.
    def bare_is_short_side(a, b):
        return (prev_doc if "_" not in a else new_doc).get("_short_ids")
    drift = [(a, b) for a in only_prev for b in only_new
             if a.split("_", 1)[0] == b.split("_", 1)[0]
             and ("_" in a) != ("_" in b)
             and bare_is_short_side(a, b)]
    for a, b in drift:
        print(f"KEY-DRIFT {a} (prev) vs {b} (new): short-id collision "
              f"drift — same query under different keys, not compared; "
              f"re-run against full-name artifacts")
    # one count per STRANDED BARE ID, not per (bare, full) pair: a bare id
    # facing two colliding full names is ONE unmeasured query, and the
    # exit-code contract counts flagged queries
    flagged += len({(a if "_" not in a else b) for a, b in drift})
    if only_prev:
        print(f"only in prev ({len(only_prev)}): {', '.join(only_prev[:10])}…"
              if len(only_prev) > 10 else
              f"only in prev: {', '.join(only_prev)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new[:10])}…"
              if len(only_new) > 10 else
              f"only in new: {', '.join(only_new)}")
    return flagged


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
