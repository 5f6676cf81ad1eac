"""Controlled 100x-slice protocol (VERDICT r12 #1): make the 100x
variance class FALSIFIABLE instead of attributed.

Rounds 10-12 measured the 100x slice in-suite (one shared JVM) and
"isolated" (one fresh JVM for the whole probe) — both leave two
uncontrolled variables that the round-12 watch items hid in:

* **JVM state** (old-gen fill from earlier queries' stage caches, JIT
  and code-cache state, GC history) — the d14 bracket spanned 11x
  across identical-plan executions of one session.
* **OS page-cache state** (a 33 GB lake read hot vs cold) — m6's 100x
  number moved 80.6 -> 112-125 s across sessions on UNCHANGED code.

This tool pins both: every (query, sample) runs in a **fresh JVM**
(bench.py subprocess with SPARK_GRAFT_BENCH_ONLY=<query>, which keeps
bench.py's own warmup + median-of-N protocol INSIDE the JVM), and
``--drop-caches`` additionally runs ``sync; echo 3 >
/proc/sys/vm/drop_caches`` before each query so every sample starts
page-cache-cold. An A/B pair of runs (with / without --drop-caches)
therefore isolates exactly the page-cache contribution the m6
attribution claimed; ``--gc-log`` writes one -Xlog:gc* file per query
(via SPARK_GRAFT_GC_LOG, see session.py) so a slow sample can be
matched minute-for-minute against full-GC stalls — the d14
attribution's test.

Usage:
    python tools/bench_100x.py [--lake .scaled/sf10u] [--out FILE]
        [--queries d14,m6,...] [--drop-caches] [--gc-log DIR]
        [--repeats 3] [--mem 64g]

Writes one JSON artifact (default BENCH_100X.json) with per-query
medians, [min,max] brackets and the protocol flags — self-describing,
like BENCH_FULL.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round-12 slice (SCALE.md "Round-12 100x lake" table)
DEFAULT_SLICE = [
    "m6", "c5", "d14", "e3l", "a27", "e5", "d13", "e3", "t30", "t24",
    "t32", "e1", "j10", "d8", "e4", "g2",
]


def drop_caches() -> None:
    subprocess.run(["sync"], check=True)
    with open("/proc/sys/vm/drop_caches", "w") as fh:
        fh.write("3\n")


def run_query(
    code: str, lake: str, mem: str, repeats: int, gc_dir: str | None
) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_BENCH_ONLY=code,
        SPARK_GRAFT_SF_DIR=lake,
        SPARK_GRAFT_DRIVER_MEM=mem,
        SPARK_GRAFT_BENCH_REPEATS=str(repeats),
        X17A5_AUG_OFFSET=env_offset(lake),
    )
    if gc_dir:
        os.makedirs(gc_dir, exist_ok=True)
        env["SPARK_GRAFT_GC_LOG"] = os.path.join(gc_dir, f"gc_{code}.log")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:], "jvm_wall_sec": wall}
    with open(os.path.join(REPO, "BENCH_SLICE.json")) as fh:
        slice_out = json.load(fh)
    (name,) = list(slice_out["queries"])
    out = {
        "query": name,
        "median_sec": slice_out["queries"][name],
        "jvm_wall_sec": wall,
    }
    if slice_out.get("bracket"):
        out["bracket"] = slice_out["bracket"].get(name)
    return out


def env_offset(lake: str) -> str:
    # the 100x lake raises doc ids past the default twin offset; keep
    # the r10-12 protocol constant so numbers stay comparable
    return "2000000" if "10u" in os.path.basename(lake.rstrip("/")) else (
        os.environ.get("X17A5_AUG_OFFSET", "100000")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lake", default=os.path.join(REPO, ".scaled/sf10u"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_100X.json"))
    ap.add_argument("--queries", default=",".join(DEFAULT_SLICE))
    ap.add_argument("--drop-caches", action="store_true")
    ap.add_argument("--gc-log", default=None, metavar="DIR")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mem", default="64g")
    args = ap.parse_args()

    codes = [c.strip() for c in args.queries.split(",") if c.strip()]
    results: dict[str, dict] = {}
    for code in codes:
        if args.drop_caches:
            drop_caches()
        res = run_query(code, args.lake, args.mem, args.repeats, args.gc_log)
        results[code] = res
        print(f"{code}: {json.dumps(res)}", flush=True)

    artifact = {
        "protocol": {
            "fresh_jvm_per_query": True,
            "page_cache_dropped": bool(args.drop_caches),
            "gc_log": args.gc_log,
            "repeats_in_jvm": args.repeats,
            "driver_mem": args.mem,
            "lake": args.lake,
        },
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
