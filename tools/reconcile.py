#!/usr/bin/env python3
"""Reconcile the driver's CORRECTNESS_r*.json against the local gate.

The r7 lesson: the local gate passed 8 queries the driver failed for two
whole rounds because the local compare was type-blind. This script makes
the divergence impossible to miss — run it whenever a driver artifact
lands, and paste its output into STATUS.md.

Usage:
  tools/reconcile.py                      # newest CORRECTNESS_r*.json summary
  tools/reconcile.py <check_output.txt>   # also diff vs a local check.py run
                                          # (a file of its PASS/FAIL lines)
"""
import glob, json, re, sys


def round_no(path):
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def load_newest():
    # sort by extracted round NUMBER, not lexicographically — 'r100' would
    # sort before 'r99' and an unpadded 'r9' before 'r10' otherwise.
    arts = sorted((a for a in glob.glob("CORRECTNESS_r*.json")
                   if round_no(a) >= 0), key=round_no)
    if not arts:
        print("no CORRECTNESS_r*.json artifact found")
        sys.exit(1)
    path = arts[-1]
    return path, json.load(open(path))


def main():
    path, d = load_newest()
    rows = {k: v for k, v in d.items() if isinstance(v, dict)}
    # a row with a non-empty 'err' is a failure even if no boolean is False
    # (a driver-side crash carries only the error string, no comparisons)
    failing = {k: v for k, v in rows.items()
               if any(v.get(c) is False for c in ("rows_match", "schema_match", "hash_match"))
               or v.get("err")}
    no_oracle = {k for k, v in rows.items()
                 if v.get("hash_match") is None and not failing.get(k)}
    print(f"== driver artifact: {path}")
    print(f"   {len(rows)} rows, {len(rows) - len(failing) - len(no_oracle)} full-pass, "
          f"{len(failing)} failing, {len(no_oracle)} without oracle")
    for k in sorted(failing):
        v = failing[k]
        why = ",".join(c for c in ("rows_match", "schema_match", "hash_match")
                       if v.get(c) is False)
        print(f"   DRIVER-FAIL {k}: {why}"
              + (f" err={v['err']}" if v.get("err") else ""))
    for k in sorted(no_oracle):
        print(f"   DRIVER-NO-ORACLE {k}")

    if len(sys.argv) > 1:
        local = {}
        for line in open(sys.argv[1]):
            m = re.match(r"^(PASS|FAIL) (q\S+)", line)
            if m:
                local[m.group(2).rstrip(":")] = m.group(1)
        drv_fail = set(failing)
        loc_fail = {k for k, s in local.items() if s == "FAIL"}
        both = set(local) & set(rows)
        diverging = {k for k in both if (k in drv_fail) != (k in loc_fail)}
        print(f"== local run: {len(local)} rows, {len(loc_fail)} failing")
        if diverging:
            for k in sorted(diverging):
                print(f"   DIVERGES {k}: driver="
                      f"{'FAIL' if k in drv_fail else 'PASS'} local={local[k]}")
            sys.exit(1)
        print("   no driver/local divergence on shared rows")
        only_local = sorted(set(local) - set(rows))
        if only_local:
            print(f"   {len(only_local)} rows local-only (new since the artifact): "
                  + " ".join(only_local[:10]) + (" ..." if len(only_local) > 10 else ""))


if __name__ == "__main__":
    main()
