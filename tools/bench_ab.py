"""Interleaved A/B crawl benchmark between two git refs.

Adjudicates performance changes on this noisy shared host the same way the
round-2 review did: fresh JVM per trial, identical bench config (crawl mode,
same page count, same cores), ALTERNATING refs so slow background-load drift
hits both sides equally, a load gate before each trial, and a contamination
check from /proc/loadavg sampled during the run. Reports best + per-trial
detail and writes BENCH/ab_trials.json.

Usage:
    python tools/bench_ab.py <refA> <refB> [trials]
refs are git refs ('.' = current working tree, uncommitted changes included).

Env: SPARK_GRAFT_AB_PAGES (default 20000), SPARK_GRAFT_AB_CPUS (default 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SPARK_GRAFT_AB_PAGES", "20000"))
CPUS = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "8"))


def _load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def _stat_jiffies() -> tuple[int, int]:
    """(system, total) jiffies across all host CPUs from /proc/stat."""
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    return vals[2] + vals[5] + vals[6], sum(vals)  # system+irq+softirq, total


def _host_sys_share(dt: float = 4.0) -> float:
    """Host-wide system-time share over a dt-second idle sample. This host's
    kernel-time storms are visible here while WE idle (loadavg never moves),
    so it works as a pre-gate — no trial has to burn 60s to detect one."""
    s0, t0 = _stat_jiffies()
    time.sleep(dt)
    s1, t1 = _stat_jiffies()
    return (s1 - s0) / max(t1 - t0, 1)


def wait_for_quiet(max_load: float = 3.0, max_sys: float = 0.05,
                   timeout_s: int = 1800) -> float:
    t0 = time.time()
    while True:
        load = _load1()
        if load < max_load:
            sys_share = _host_sys_share()
            if sys_share < max_sys or time.time() - t0 > timeout_s:
                return load
            print(f"host sys share {sys_share:.2f} >= {max_sys} (storm), waiting...",
                  file=sys.stderr)
        else:
            print(f"load {load} >= {max_load}, waiting...", file=sys.stderr)
        if time.time() - t0 > timeout_s:
            return load
        time.sleep(20)


def workdir_for(ref: str) -> str:
    if ref == ".":
        return REPO
    path = f"/tmp/ab_wt_{ref.replace('/', '_')}"
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--force", path, ref],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def run_once(ref: str, cwd: str, max_attempts: int = 5) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MODE="crawl",
        SPARK_GRAFT_CRAWL_PAGES=str(N_PAGES),
        SPARK_GRAFT_CPUS=str(CPUS),
    )
    env.pop("SPARK_GRAFT_EPOCH_PROFILE", None)
    for attempt in range(1, max_attempts + 1):
        load_before = wait_for_quiet()
        samples: list[float] = []
        stop = threading.Event()

        def sample():
            while not stop.is_set():
                samples.append(_load1())
                time.sleep(5)

        th = threading.Thread(target=sample, daemon=True)
        th.start()
        # host-wide system-jiffies share across the trial window: the
        # kernel-storm signal that works for BOTH refs regardless of how
        # their bench.py accounts CPU. (A first cut used
        # getrusage(RUSAGE_CHILDREN) deltas, but the JVM reparents on exit
        # and escapes them — the delta then measures only the python side,
        # whose Arrow/socket I/O is inherently ~50% system time, flagging
        # every trial including a best-ever 37.3s wall.) Measured: a clean
        # trial puts ~3% of host capacity into system time, a storm ~20%.
        j0 = _stat_jiffies()
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True,
            env=env, cwd=cwd,
        )
        j1 = _stat_jiffies()
        stop.set()
        th.join(timeout=6)
        crawl = json.loads(out.stdout.strip().splitlines()[-1])["crawl"]
        body = samples[2:] or samples
        excess = [max(0.0, l - CPUS) for l in body]
        host_sys_share = (j1[0] - j0[0]) / max(j1[1] - j0[1], 1)
        r = {
            "ref": ref,
            "crawl_sec": crawl["crawl_sec"],
            "init_sec": crawl["init_sec"],
            "pages_per_sec": crawl["pages_per_sec"],
            "pages_crawled": crawl["pages_crawled"],
            "load_before": load_before,
            "load_mean_excess": round(sum(excess) / max(len(excess), 1), 2),
            "load_max": max(body) if body else 0.0,
            "host_sys_share": round(host_sys_share, 3),
            "attempt": attempt,
            "contaminated": False,
        }
        # two independent contamination signals: neighbor load (the classic
        # burst) and kernel-time storms, which loadavg misses entirely
        reasons = []
        if r["load_mean_excess"] > 1.5:
            reasons.append("neighbor-load")
        if host_sys_share > 0.08:
            reasons.append("kernel-storm")
        r["contaminated"] = bool(reasons)
        print(
            f"trial ref={ref} crawl={r['crawl_sec']}s attempt={attempt} "
            f"excess={r['load_mean_excess']} host_sys={r['host_sys_share']}"
            + (f" CONTAMINATED ({','.join(reasons)})"
               + (", retrying" if attempt < max_attempts else "")
               if r["contaminated"] else ""),
            file=sys.stderr,
        )
        if not r["contaminated"] or attempt == max_attempts:
            return r
        # storms last minutes; an immediate retry usually lands in the same
        # one — cool down before re-gating
        time.sleep(90)
    raise RuntimeError("unreachable")


def main() -> None:
    ref_a, ref_b = sys.argv[1], sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    dirs = {r: workdir_for(r) for r in (ref_a, ref_b)}
    all_trials: list[dict] = []
    for _ in range(trials):
        for ref in (ref_a, ref_b):
            all_trials.append(run_once(ref, dirs[ref]))
    summary = {}
    for ref in (ref_a, ref_b):
        clean = [t for t in all_trials if t["ref"] == ref and not t["contaminated"]]
        pool = clean or [t for t in all_trials if t["ref"] == ref]
        best = min(pool, key=lambda t: t["crawl_sec"])
        summary[ref] = {
            "best_crawl_sec": best["crawl_sec"],
            "best_pages_per_sec": best["pages_per_sec"],
            "clean_trials": len(clean),
            "walls": sorted(t["crawl_sec"] for t in pool),
        }
    out = {"pages": N_PAGES, "cpus": CPUS, "summary": summary, "trials": all_trials}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_trials.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"], indent=1))


if __name__ == "__main__":
    main()
