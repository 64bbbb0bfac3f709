#!/usr/bin/env python3
"""Era-corrected comparison of BENCH_FULL.json captures.

Executes SURVEY.md §6 "Era calibration": the sandbox host's delivered
per-thread throughput swings between multi-hour eras with calm
steal/iowait/PSI counters, inflating wall AND task-CPU together on
byte-identical work. Each capture's host windows carry a fixed-work
single-thread probe (graft.Bench.calibProbe, checksum-pinned in
BenchWorkSpec): `calib_s` at window OPEN (r16+) and `calib_close_s` at
window CLOSE (r17+). Cross-round CPU compares as

    cpu_norm = cpu_s * (calib_ref / calib_window)

with calib_window = max(calib_s, calib_close_s) — the conservative
choice: a window is only as trustworthy as its worst observed era.
When the two probes disagree by >25% the era shifted MID-window (the
r16 failure mode: iso:q118 opened at a calm 0.497 s yet measured
286.7 s CPU on an 88.9 s-calm shape); such windows are labelled
"era-shifted — inconclusive" and excluded from normalized ratios
unless no clean sibling window exists.

MULTI-CAPTURE MIN-AGGREGATION (r16 verdict #2): the isolated-rerun
phase has high co-tenant variance (q111 isolated cpu 44.3 vs 23.4 s
across same-HEAD captures with identical shapes), so the documented
adjudication rule is "min-aggregate across >=2 captures before
flagging an isolated regression". Pass several files per side,
separated by `--`:

    bench_compare.py OLD1 [OLD2 ...] -- NEW1 [NEW2 ...]
    bench_compare.py OLD NEW              # single-capture, as before

Per side and per query, the minimum raw cpu and the minimum
era-normalized cpu (cpu_s / calib_window, clean windows preferred)
are taken across captures; ratios compare those minima. Captures from
rounds before the probes degrade gracefully: calib_s-only windows
normalize by the open probe (no shift detection possible); no-calib
captures give raw-only ratios with a warning. Stdlib only — runnable
anywhere the artifacts are.
"""
import argparse
import json
import sys

SHIFT_BAND = 0.25  # open/close disagreement that marks a window era-shifted


def load(path):
    with open(path) as f:
        return json.load(f)


def family_windows(doc):
    """label -> (calib_window, era_shifted) for battery-family windows;
    'iso:<q>' kept as-is. calib_window = max(open, close) when both
    probes exist, the open probe alone on r16-era captures, None before
    the probe. era_shifted = the two probes disagree by > SHIFT_BAND
    (None when only one probe exists — shift is undetectable)."""
    out = {}
    for w in doc.get("host", {}).get("windows", []):
        label = w.get("family", "")
        if label.startswith("abandoned:"):
            continue
        h = w.get("host", {})
        op, cl = h.get("calib_s"), h.get("calib_close_s")
        if op and cl:
            out[label] = (max(op, cl), max(op, cl) / min(op, cl) - 1 > SHIFT_BAND)
        elif op:
            out[label] = (op, None)
        else:
            out[label] = (None, None)
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


def side_stats(docs, isolated):
    """Per query: min raw cpu (+ its shape), min era-normalized cpu
    (cpu/calib, clean windows preferred), and whether every calibrated
    window that measured it was era-shifted."""
    per_query = {}
    for doc in docs:
        work = section(doc, isolated)
        fams = family_windows(doc)
        heads = sorted(h for h in fams if not h.startswith("iso:"))
        for q, passes in work.items():
            cpu = min_cpu(passes)
            if cpu is None or cpu <= 0:
                continue
            label = f"iso:{q}" if isolated else family_of(q, heads)
            calib, shifted = fams.get(label, (None, None))
            per_query.setdefault(q, []).append(
                {"cpu": cpu, "calib": calib, "shifted": shifted,
                 "shape": shape(passes)})
    out = {}
    for q, entries in per_query.items():
        best = min(entries, key=lambda e: e["cpu"])
        calibrated = [e for e in entries if e["calib"]]
        clean = [e for e in calibrated if not e["shifted"]]
        pool = clean or calibrated  # fall back to shifted-only, flagged below
        norm = min(e["cpu"] / e["calib"] for e in pool) if pool else None
        out[q] = {"cpu": best["cpu"], "shape": best["shape"], "norm": norm,
                  "all_shifted": bool(calibrated) and not clean,
                  "captures": len(entries)}
    return out


def compare(olds, news, isolated, threshold):
    os_, ns_ = side_stats(olds, isolated), side_stats(news, isolated)
    rows = []
    for q in sorted(set(os_) & set(ns_)):
        o, n = os_[q], ns_[q]
        raw = n["cpu"] / o["cpu"]
        norm = (n["norm"] / o["norm"]
                if o["norm"] and n["norm"] else None)
        inconclusive = o["all_shifted"] or n["all_shifted"]
        rows.append({
            "query": q, "old_cpu_s": round(o["cpu"], 1),
            "new_cpu_s": round(n["cpu"], 1),
            "raw_ratio": round(raw, 2),
            "norm_ratio": round(norm, 2) if norm is not None else None,
            "same_shape": o["shape"] == n["shape"],
            "old_shape": o["shape"], "new_shape": n["shape"],
            "era_shifted": inconclusive,
            "captures": (o["captures"], n["captures"]),
        })
    flagged = [r for r in rows
               if (r["norm_ratio"] if r["norm_ratio"] is not None
                   else r["raw_ratio"]) > threshold and r["same_shape"]
               and not r["era_shifted"]]
    shifted = [r for r in rows if r["era_shifted"]
               and (r["norm_ratio"] if r["norm_ratio"] is not None
                    else r["raw_ratio"]) > threshold and r["same_shape"]]
    return rows, flagged, shifted


def probe_summary(docs):
    """label -> 'open->close' strings for the newest capture per side."""
    lines = []
    for doc, name in docs:
        for w in doc.get("host", {}).get("windows", []):
            label = w.get("family", "")
            if label.startswith("abandoned:"):
                continue
            h = w.get("host", {})
            op, cl = h.get("calib_s"), h.get("calib_close_s")
            if op is None:
                continue
            s = f"{op:.2f}" + (f"->{cl:.2f}" if cl is not None else "")
            if op and cl and max(op, cl) / min(op, cl) - 1 > SHIFT_BAND:
                s += " SHIFTED"
            lines.append(f"{name} {label}: {s}s")
    return lines


def main():
    # `--` splits old captures from new ones; handle it before argparse
    # (argparse swallows a literal `--`). Two bare positionals = the
    # classic single-capture-per-side form. Options may appear anywhere;
    # value-taking options keep their following token with them (a bare
    # `--threshold 1.5` must not turn "1.5" into a capture path).
    VALUE_OPTS = {"--threshold"}
    argv = sys.argv[1:]
    olds_paths, news_paths = None, None
    if "--" in argv:
        i = argv.index("--")

        def split(tokens):
            paths, opts, skip = [], [], False
            for t in tokens:
                if skip:
                    opts.append(t)
                    skip = False
                elif t.startswith("-"):
                    opts.append(t)
                    # argparse accepts unambiguous abbreviations
                    # (--thresh), so match by prefix; =-joined forms
                    # carry their value inline and never skip
                    bare = t.split("=", 1)[0]
                    skip = ("=" not in t and len(bare) > 2 and
                            any(o.startswith(bare) for o in VALUE_OPTS))
                else:
                    paths.append(t)
            return paths, opts

        olds_paths, pre_opts = split(argv[:i])
        news_paths, post_opts = split(argv[i + 1:])
        argv = pre_opts + post_opts
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        usage="bench_compare.py OLD [OLD2 ...] -- NEW [NEW2 ...]  |  "
              "bench_compare.py OLD NEW [options]")
    if olds_paths is None:
        ap.add_argument("old"), ap.add_argument("new")
    ap.add_argument("--isolated", action="store_true",
                    help="compare work_isolated (fresh-JVM) instead of in-battery")
    ap.add_argument("--threshold", type=float, default=1.2,
                    help="flag same-shape queries whose normalized ratio exceeds this")
    ap.add_argument("--all", action="store_true", help="print every query, not just flagged")
    a = ap.parse_args(argv)
    if olds_paths is None:
        olds_paths, news_paths = [a.old], [a.new]
    if not olds_paths or not news_paths:
        ap.error("need at least one capture on each side of --")
    olds = [load(p) for p in olds_paths]
    news = [load(p) for p in news_paths]
    rows, flagged, shifted = compare(olds, news, a.isolated, a.threshold)
    if (not any(c for c, _ in (fw for d in olds for fw in family_windows(d).values())) or
            not any(c for c, _ in (fw for d in news for fw in family_windows(d).values()))):
        print("WARNING: a capture predates the calib probe — raw ratios only; "
              "era swings are NOT corrected", file=sys.stderr)
    kind = "work_isolated" if a.isolated else "in-battery work"
    print(f"# {kind}: {len(rows)} comparable queries "
          f"({'+'.join(olds_paths)} -> {'+'.join(news_paths)}; "
          f"min-aggregated per side)")
    for line in probe_summary(list(zip(olds, olds_paths)) +
                              list(zip(news, news_paths))):
        print(f"# probe {line}")
    for r in (rows if a.all else flagged + shifted):
        tag = "SAME-SHAPE" if r["same_shape"] else "shape-changed"
        if r["era_shifted"]:
            tag += "; ERA-SHIFTED — inconclusive, use a sibling capture"
        print(f"{r['query']}: cpu {r['old_cpu_s']} -> {r['new_cpu_s']} s "
              f"raw x{r['raw_ratio']} norm x{r['norm_ratio']} "
              f"captures {r['captures'][0]}v{r['captures'][1]} [{tag}]")
        if not r["same_shape"]:
            print(f"    {r['old_shape']} -> {r['new_shape']} "
                  "(rows, sh_read_mb, sh_write_mb, tasks)")
    if not a.all:
        print(f"# {len(flagged)} flagged (same shape, norm ratio > "
              f"{a.threshold}, clean windows); {len(shifted)} era-shifted "
              f"inconclusive; {len(rows) - len(flagged) - len(shifted)} "
              "within band or shape-explained")
    return 0 if not flagged else 1


if __name__ == "__main__":
    sys.exit(main())
