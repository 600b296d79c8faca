"""Phase-cost plotter.

Mirrors the reference's plotter binary (/root/reference/benchmark/src/bin/
plotter.rs:16-57): parses `name: ms` timer traces (produced with
HALO2_LASSO_TPU_TIMER=1 or `timed.records()`), groups phases into cost
breakdowns, and renders either an ASCII table or (if matplotlib is
available) a stacked bar chart per k.
"""

import argparse
import collections
import re
import sys

LINE_RE = re.compile(r"^[·]*([\w./-]+?)(?:-(\d+))?: ([\d.]+)ms$")


def parse(stream):
    """-> {k or None: {phase: total_ms}}"""
    out = collections.defaultdict(lambda: collections.defaultdict(float))
    for line in stream:
        m = LINE_RE.match(line.strip())
        if not m:
            continue
        name, k, ms = m.group(1), m.group(2), float(m.group(3))
        out[int(k) if k else None][name] += ms
    return out


def render_ascii(groups):
    for k in sorted(groups, key=lambda v: (v is None, v)):
        phases = groups[k]
        total = sum(phases.values())
        print(f"== k={k} (total {total:.1f}ms) ==")
        width = max(len(p) for p in phases)
        for phase, ms in sorted(phases.items(), key=lambda kv: -kv[1]):
            bar = "#" * int(40 * ms / total) if total else ""
            print(f"  {phase:<{width}} {ms:9.1f}ms {bar}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile", nargs="?", help="timer trace file (default stdin)")
    ap.add_argument("--png", help="write a stacked bar chart to this path")
    args = ap.parse_args()

    stream = open(args.logfile) if args.logfile else sys.stdin
    groups = parse(stream)
    if not groups:
        print("no timer records found (run with HALO2_LASSO_TPU_TIMER=1)")
        return
    render_ascii(groups)

    if args.png:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping chart")
            return
        ks = sorted(k for k in groups if k is not None)
        phases = sorted({p for g in groups.values() for p in g})
        bottom = [0.0] * len(ks)
        fig, ax = plt.subplots(figsize=(8, 5))
        for phase in phases:
            vals = [groups[k].get(phase, 0.0) for k in ks]
            ax.bar([str(k) for k in ks], vals, bottom=bottom, label=phase)
            bottom = [b + v for b, v in zip(bottom, vals)]
        ax.set_xlabel("k")
        ax.set_ylabel("ms")
        ax.legend(fontsize=7)
        fig.savefig(args.png, dpi=120, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
