#!/usr/bin/env python3
"""Per-query bench regression tripwire.

The r8 lesson: q50 regressed 1.2 s -> 27.2 s and the local gates stayed
green because nothing compared per-query times round-over-round — the
regression was visible only in the driver artifact. This script diffs the
newest two BENCH_r*.json per-query decisecond maps and flags any query
whose time grew more than 3x AND more than 1 s. Run it in the round-open
checklist and paste its output into STATUS.md, like reconcile.py.

A query absent from the older artifact's explicit map was at most that
artifact's qfloor_ds (the explicit map is slowest-first under a byte
budget; omission is a proof of "<= floor"), so the floor is used as its
old time — a was-fast-now-slow query is still caught.

Usage: tools/benchdiff.py [old.json new.json]   # default: newest two
Exit: nonzero iff a regression is flagged.
"""
import glob, json, re, sys


def round_no(path):
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def load(path):
    d = json.load(open(path))
    p = d.get("parsed") or {}
    qmap = {k: int(v) for k, v in (p.get("queries") or {}).items()}
    return {
        "path": path,
        "total": p.get("value"),
        "qn": p.get("qn"),
        "floor_ds": int(p.get("qfloor_ds") or 0),
        "queries": qmap,
    }


def main():
    if len(sys.argv) == 3:
        paths = sys.argv[1:3]
    else:
        arts = sorted(glob.glob("BENCH_r*.json"), key=round_no)
        arts = [a for a in arts if round_no(a) >= 0]
        if len(arts) < 2:
            print("benchdiff: need two BENCH_r*.json artifacts")
            return
        paths = arts[-2:]
    old, new = load(paths[0]), load(paths[1])
    if not new["queries"]:
        print(f"benchdiff: {new['path']} has no parsed per-query map")
        sys.exit(1)
    if not old["queries"]:
        # r1-r6 artifacts have parsed:null (the tail-window era); a floor of
        # 0 would flag every query, so there is nothing meaningful to diff.
        print(f"benchdiff: {old['path']} has no parsed per-query map — "
              f"no baseline to diff against")
        return
    print(f"== bench diff: {old['path']} ({old['total']} s / {old['qn']} q)"
          f" -> {new['path']} ({new['total']} s / {new['qn']} q)")
    flagged = []
    for q, ds_new in sorted(new["queries"].items(), key=lambda kv: -kv[1]):
        # absent-from-old == "was at most the floor"; brand-new queries are
        # indistinguishable from omitted-fast ones here, so a slow NEW query
        # also flags — correct behavior: a new slow query deserves a look too.
        ds_old = old["queries"].get(q, old["floor_ds"])
        if ds_new > 3 * max(ds_old, 1) and ds_new - ds_old > 10:
            flagged.append((q, ds_old, ds_new))
    if flagged:
        for q, o, n in flagged:
            print(f"   REGRESSION q{q}: {o/10:.1f} s -> {n/10:.1f} s "
                  f"({n/max(o,1):.1f}x, +{(n-o)/10:.1f} s)")
        sys.exit(1)
    print(f"   no per-query regression (>3x and >1 s) across "
          f"{len(new['queries'])} explicit entries")


if __name__ == "__main__":
    main()
