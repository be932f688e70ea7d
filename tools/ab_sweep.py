"""One-shot A/B sweep of the default-off render-perf candidates.

Runs ``bench.py`` under every candidate flag combination in one process
sequence (each bench invocation is a subprocess so jit caches / device state
can't leak between points) and appends the JSON result lines, tagged with
the flag set, to ``--out`` (default /tmp/ab_sweep.jsonl). Designed to run
unattended the moment the remote TPU tunnel recovers:

    python tools/ab_sweep.py --out /tmp/ab_sweep.jsonl

Candidates (PERFORMANCE.md "Round-3 candidates awaiting on-chip A/B"):
  * grouped chunk dispatch  (--group 4 / 8)
  * two-phase early termination (--term)
  * L2-only selection (--no-l1)
  * packed compact feature tables (--pack 2 / 4)
  * sub-segment granularity (--cs 16 --sub 4)
  * chunk-size re-tune at the new balance point (--chunk 4096 / 16384)
  * the best-of compositions (term+group, no-l1+term+group)

Each point repeats ``--reps`` times (default 2) so device-state drift —
the remote chip has measured ±5-9% session-to-session variance — shows up
in the record rather than silently picking a winner.
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

# NOTE: since round 4 bench.py DEFAULTS to no-l1 + term + hterm + group4
# (PERFORMANCE.md round-4 adjudication) — points are spelled explicitly
POINTS = [
    ("baseline-r3", ["--l1", "--no-term", "--no-hterm", "--group", "1"]),
    ("default", []),               # = no-l1 + term + hterm-auto + group4
    ("term-only", ["--no-hterm"]),
    ("l1+default", ["--l1"]),
    ("pack2", ["--pack", "2", "--l1", "--no-term", "--no-hterm",
               "--group", "1"]),
    ("cs16sub4+default", ["--cs", "16", "--sub", "4"]),
    ("chunk4096+group8", ["--chunk", "4096", "--group", "8"]),
    ("chunk16384", ["--chunk", "16384"]),
    # train-side phases (one record per bench JSON line): decides
    # fused_main_density adoption and re-pins the r3 steps/s table
    ("train", ["--train"]),
]


def run_point(name, flags, out_path, timeout_s):
    t0 = time.time()
    try:
        proc = subprocess.run(
            # sweep points measure the render path only — skip the default
            # driver-visible train metric (it adds ~2 min/point)
            [sys.executable, "bench.py", "--no-train-metric", *flags],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=Path(__file__).resolve().parent.parent)
        lines = []
        for ln in proc.stdout.strip().splitlines():
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                continue
        rec = {"point": name, "flags": flags, "wall_s": round(time.time() - t0, 1)}
        if not lines:
            rec["error"] = (proc.stderr or proc.stdout)[-800:]
        elif len(lines) == 1:
            rec.update(lines[-1])
        else:  # --train prints one line per phase
            rec["phases"] = lines
        if proc.returncode != 0:
            # partial output from a crashed bench (e.g. OOM mid-phase) must
            # not read as a valid measurement
            rec["error"] = (f"exit {proc.returncode}: "
                            + (proc.stderr or proc.stdout)[-400:])
    except subprocess.TimeoutExpired:
        rec = {"point": name, "flags": flags, "error": "timeout",
               "wall_s": round(time.time() - t0, 1)}
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_sweep.jsonl")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-point wall timeout (first compile is slow)")
    ap.add_argument("--only", default=None,
                    help="comma-separated point names to run")
    args = ap.parse_args()
    points = POINTS
    if args.only:
        keep = set(args.only.split(","))
        points = [p for p in POINTS if p[0] in keep]
    for rep in range(args.reps):
        for name, flags in points:
            run_point(f"{name}#r{rep}", flags, args.out, args.timeout)




def summarize(path="/tmp/ab_sweep.jsonl"):
    """Collapse the sweep records into one line per point (mean over reps,
    spread, guardrails) — paste-ready for PERFORMANCE.md."""
    import collections
    recs = [json.loads(l) for l in Path(path).read_text().splitlines()]
    by_point = collections.defaultdict(list)
    for r in recs:
        by_point[r["point"].split("#")[0]].append(r)
    rows = []
    for point, rs in by_point.items():
        vals = [r["value"] for r in rs if "value" in r and "error" not in r]
        errs = [r for r in rs if "error" in r]
        if vals:
            mean = sum(vals) / len(vals)
            spread = (max(vals) - min(vals)) / mean if len(vals) > 1 else 0.0
            tails = [max(r.get("budget_tail", 0), r.get("head_tail", 0))
                     for r in rs if "value" in r]
            rows.append((mean, f"| {point} | {mean/1000:.0f}k "
                         f"(±{spread:.1%}) | {max(tails):.2g} |"
                         + (f" {len(errs)} ERR" if errs else "")))
        elif errs:
            rows.append((0, f"| {point} | ERROR | — | "
                         + errs[0]["error"][:120]))
        else:  # train point: report the full-step phase
            for r in rs:
                for ph in r.get("phases", []):
                    rows.append((0, f"| {point}:{ph['metric']} | "
                                 f"{ph['value']} {ph['unit']} | — |"))
    print("| point | rays/s (spread) | worst tail |")
    print("|---|---|---|")
    for _, row in sorted(rows, reverse=True):
        print(row)


if __name__ == "__main__":
    if "--summarize" in sys.argv:
        summarize(sys.argv[sys.argv.index("--summarize") + 1]
                  if len(sys.argv) > sys.argv.index("--summarize") + 1
                  else "/tmp/ab_sweep.jsonl")
    else:
        main()
