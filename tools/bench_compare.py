#!/usr/bin/env python3
"""Era-corrected comparison of two BENCH_FULL.json captures.

Executes SURVEY.md §6 "Era calibration": the sandbox host's delivered
per-thread throughput swings between multi-hour eras with calm
steal/iowait/PSI counters, inflating wall AND task-CPU together on
byte-identical work. Each capture's host windows carry `calib_s` — a
fixed-work single-thread probe (graft.Bench.calibProbe, checksum-pinned
in BenchWorkSpec) — so cross-round CPU compares as

    cpu_norm = cpu_s * (calib_ref / calib_window)

This tool reconstructs each query's family window (the battery splits
into contiguous families labeled by their head query), normalizes both
sides, and reports per-query raw vs normalized ratios alongside the
work-shape delta (input rows, shuffle MB, task count). The verdict a
reader wants: "normalized CPU flat + identical shape = same operator
cost, era noise only; normalized CPU moved on identical shape = real."

Captures from rounds before the probe (no calib_s) degrade to raw-only
with a warning. Stdlib only — runnable anywhere the artifacts are.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def family_windows(doc):
    """label -> calib_s for battery-family windows; 'iso:<q>' kept as-is."""
    out = {}
    for w in doc.get("host", {}).get("windows", []):
        label = w.get("family", "")
        if label.startswith("abandoned:"):
            continue
        calib = w.get("host", {}).get("calib_s")
        out[label] = calib
    return out


def family_of(query, heads):
    """Families are contiguous over the sorted name list: a query belongs
    to the greatest head <= its name."""
    cands = [h for h in heads if h <= query]
    return max(cands) if cands else None


def min_cpu(work_passes):
    vals = [p.get("cpu_s") for p in work_passes if p.get("cpu_s", -1) >= 0]
    return min(vals) if vals else None


def shape(work_passes):
    """The work identity of the best pass: rows/shuffle/tasks."""
    best = None
    for p in work_passes:
        if p.get("cpu_s", -1) >= 0 and (best is None or p["cpu_s"] < best["cpu_s"]):
            best = p
    if best is None:
        return None
    return (best.get("input_rows"), round(best.get("sh_read_mb", 0), 1),
            round(best.get("sh_write_mb", 0), 1), best.get("tasks"))


def section(doc, isolated):
    return doc.get("work_isolated" if isolated else "work", {}) or {}


def compare(old, new, isolated, threshold):
    ow, nw = section(old, isolated), section(new, isolated)
    ofam, nfam = family_windows(old), family_windows(new)
    oheads = sorted(h for h in ofam if not h.startswith("iso:"))
    nheads = sorted(h for h in nfam if not h.startswith("iso:"))
    rows = []
    for q in sorted(set(ow) & set(nw)):
        oc, nc = min_cpu(ow[q]), min_cpu(nw[q])
        if oc is None or nc is None or oc <= 0:
            continue
        if isolated:
            ocal, ncal = ofam.get(f"iso:{q}"), nfam.get(f"iso:{q}")
        else:
            ocal = ofam.get(family_of(q, oheads))
            ncal = nfam.get(family_of(q, nheads))
        raw = nc / oc
        # normalize BOTH sides to the old capture's era: scale new cpu by
        # (old window probe / new window probe)
        norm = raw * (ocal / ncal) if ocal and ncal else None
        osh, nsh = shape(ow[q]), shape(nw[q])
        rows.append({
            "query": q, "old_cpu_s": round(oc, 1), "new_cpu_s": round(nc, 1),
            "raw_ratio": round(raw, 2),
            "norm_ratio": round(norm, 2) if norm is not None else None,
            "same_shape": osh == nsh,
            "old_shape": osh, "new_shape": nsh,
        })
    flagged = [r for r in rows
               if (r["norm_ratio"] if r["norm_ratio"] is not None
                   else r["raw_ratio"]) > threshold and r["same_shape"]]
    return rows, flagged


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old"), ap.add_argument("new")
    ap.add_argument("--isolated", action="store_true",
                    help="compare work_isolated (fresh-JVM) instead of in-battery")
    ap.add_argument("--threshold", type=float, default=1.2,
                    help="flag same-shape queries whose normalized ratio exceeds this")
    ap.add_argument("--all", action="store_true", help="print every query, not just flagged")
    a = ap.parse_args()
    old, new = load(a.old), load(a.new)
    rows, flagged = compare(old, new, a.isolated, a.threshold)
    ocal = family_windows(old)
    ncal = family_windows(new)
    if not any(v for v in ocal.values()) or not any(v for v in ncal.values()):
        print("WARNING: a capture predates the calib probe — raw ratios only; "
              "era swings are NOT corrected", file=sys.stderr)
    kind = "work_isolated" if a.isolated else "in-battery work"
    print(f"# {kind}: {len(rows)} comparable queries "
          f"({a.old} -> {a.new})")
    calibs = [(l, c) for l, c in sorted(ncal.items()) if c]
    if calibs:
        oc = {l: c for l, c in ocal.items() if c}
        print("# era probes (old -> new, per window): " + ", ".join(
            f"{l}: {oc[l]:.2f}->{c:.2f}s" for l, c in calibs if l in oc))
    for r in (rows if a.all else flagged):
        tag = "SAME-SHAPE" if r["same_shape"] else "shape-changed"
        print(f"{r['query']}: cpu {r['old_cpu_s']} -> {r['new_cpu_s']} s "
              f"raw x{r['raw_ratio']} norm x{r['norm_ratio']} [{tag}]")
        if not r["same_shape"]:
            print(f"    {r['old_shape']} -> {r['new_shape']} "
                  "(rows, sh_read_mb, sh_write_mb, tasks)")
    if not a.all:
        print(f"# {len(flagged)} flagged (same shape, norm ratio > "
              f"{a.threshold}); {len(rows) - len(flagged)} within band or "
              "shape-explained")
    return 0 if not flagged else 1


if __name__ == "__main__":
    sys.exit(main())
