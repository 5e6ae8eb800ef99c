#!/usr/bin/env python3
"""Diff two archived bench records (bench_history/bench_out_r{N}.json).

For every query whose min-of-two timing moved more than THRESH x between the
two runs, classify the move:

  - "plan/data"    — shuffle bytes (read+write, pass-2) also moved >10%,
                     or (since r14) the pass-2 codegen compilation count
                     moved: the PLAN or its input changed; investigate.
  - "environment"  — shuffle volume, tasks, and codegen compiles are all
                     unchanged: same plan, same data, different wall-clock
                     — JIT, page cache, CPU contention, GC pressure. The
                     per-query gc_ms/jit_ms deltas (r14+) are printed so the
                     environment claim is itself evidenced in-record.
  - "no-metrics"   — either run lacks listener metrics for the query
                     (listener_dropped > 0 or pre-archive round).

Usage: tools/bench_diff.py [old.json new.json]   (default: two most recent
archives in bench_history/). Exits 0 always — this is evidence, not a gate.
"""
import glob
import json
import sys

THRESH = 1.5


def load(path):
    with open(path) as f:
        return json.load(f)


def min_time(rec, q):
    v = rec.get("queries", {}).get(q)
    return v if isinstance(v, (int, float)) and v >= 0 else None


def shuffle_mb(rec, q):
    m = rec.get("metrics", {}).get(q)
    if not m:
        return None
    return m.get("shuffle_read_mb", 0.0) + m.get("shuffle_write_mb", 0.0)


def jvm_field(rec, q, field):
    m = rec.get("metrics", {}).get(q) or {}
    v = m.get(field)
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def jvm_note(old, new, q):
    parts = []
    for f in ("gc_ms", "jit_ms"):
        a, b = jvm_field(old, q, f), jvm_field(new, q, f)
        if a is not None and b is not None:
            parts.append(f"{f} {a}->{b}")
    return "  " + " ".join(parts) if parts else ""


def main():
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        hist = sorted(glob.glob("bench_history/bench_out_r*.json"))
        if len(hist) < 2:
            print("need two archives in bench_history/ (or pass two paths)")
            return
        old_p, new_p = hist[-2], hist[-1]
    old, new = load(old_p), load(new_p)
    print(f"diff {old_p} ({old.get('sf')}) -> {new_p} ({new.get('sf')})")
    if old.get("sf") != new.get("sf"):
        print("WARNING: different sf dirs — timing ratios are not comparable")
    moved = []
    for q in sorted(set(old.get("queries", {})) & set(new.get("queries", {}))):
        t0, t1 = min_time(old, q), min_time(new, q)
        if t0 is None or t1 is None or min(t0, t1) <= 0:
            continue
        ratio = t1 / t0
        if ratio > THRESH or ratio < 1 / THRESH:
            s0, s1 = shuffle_mb(old, q), shuffle_mb(new, q)
            dropped = old.get("listener_dropped", 0) or new.get("listener_dropped", 0)
            if s0 is None or s1 is None or dropped:
                cls = "no-metrics"
            elif max(s0, s1) > 0.05 and (min(s0, s1) == 0 or max(s0, s1) / max(min(s0, s1), 1e-9) > 1.1):
                cls = "plan/data"
            else:
                t_old = old["metrics"][q].get("tasks", 0)
                t_new = new["metrics"][q].get("tasks", 0)
                same_tasks = t_old == t_new or (
                    min(t_old, t_new) > 0 and max(t_old, t_new) / min(t_old, t_new) <= 1.1)
                # codegen compile count (r14+): moves only with the plan —
                # a shuffle-silent plan change (e.g. a projection rewrite)
                # still surfaces here. The COLD pass carries the signal
                # (warm-pass compiles are JVM codegen-cache hits, ~0); the
                # count is order-dependent across the roster (earlier
                # queries warm shared classes), so it is a heuristic witness
                # on top of tasks/shuffle, not a sole discriminator.
                cg0 = jvm_field(old, q, "codegen_compiles_p1")
                cg1 = jvm_field(new, q, "codegen_compiles_p1")
                same_cg = cg0 is None or cg1 is None or cg0 == cg1 or (
                    min(cg0, cg1) > 0 and max(cg0, cg1) / min(cg0, cg1) <= 1.1)
                cls = "environment" if same_tasks and same_cg else "plan/data"
            moved.append((q, t0, t1, ratio, s0, s1, cls))
    if not moved:
        print(f"no query moved more than {THRESH}x")
        return
    for q, t0, t1, r, s0, s1, cls in sorted(moved, key=lambda x: -x[3]):
        print(f"  {q}: {t0:.2f}s -> {t1:.2f}s ({r:.2f}x)  "
              f"shuffle {s0 if s0 is not None else '?'} -> "
              f"{s1 if s1 is not None else '?'} MB  [{cls}]"
              + jvm_note(old, new, q))
    counts = {}
    for *_, cls in moved:
        counts[cls] = counts.get(cls, 0) + 1
    print("summary:", ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))


if __name__ == "__main__":
    main()
