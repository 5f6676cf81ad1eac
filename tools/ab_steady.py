"""Single-JVM interleaved STEADY-STATE A/B of one query between the
working tree and HEAD (or any git rev) under bench.py's own protocol:
construct the plan once, one untimed warmup execution (fills stage
caches, codegen, JIT), then timed noop reps that reuse the plan and the
caches — exactly what the bench's median-of-3 measures. Complements
tools/ab_inline.py, which re-constructs and re-materializes per rep and
therefore measures the COLD path (it over-weights construction-time
persists that the bench amortizes into the warmup).

Usage: python tools/ab_steady.py <query_name> [reps=5] [rounds=2] [rev=HEAD]
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rev = sys.argv[4] if len(sys.argv) > 4 else "HEAD"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_root = tempfile.mkdtemp(prefix="ab_old_")
    subprocess.run(
        f"git -C {repo} archive {rev} x17a5_spark | tar -x -C {old_root}",
        shell=True, check=True,
    )
    os.rename(
        os.path.join(old_root, "x17a5_spark"),
        os.path.join(old_root, "x17a5_old"),
    )
    subprocess.run(
        f"cd {old_root}/x17a5_old && grep -rl 'x17a5_spark' --include='*.py' . "
        "| xargs -r sed -i 's/x17a5_spark/x17a5_old/g'",
        shell=True, check=True,
    )
    sys.path.insert(0, old_root)

    from x17a5_spark.cache import release_stage_caches as rel_new
    from x17a5_spark.queries import registry as reg_new
    from x17a5_spark.session import get_spark

    from x17a5_old.cache import release_stage_caches as rel_old  # noqa: E402
    from x17a5_old.queries import registry as reg_old  # noqa: E402

    spark = get_spark("ab_steady")
    qn, _ = reg_new()
    qo, _ = reg_old()

    def steady(fn, rel) -> list[float]:
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
        rel()
        spark.catalog.clearCache()
        return ts

    new_all, old_all = [], []
    for r in range(rounds):
        tn = steady(qn[name], rel_new)
        to = steady(qo[name], rel_old)
        new_all += tn
        old_all += to
        print(
            f"round {r}: NEW {[round(x, 3) for x in tn]} | "
            f"OLD {[round(x, 3) for x in to]}"
        )
    print(
        f"{name}: NEW steady median {statistics.median(new_all):.3f} "
        f"OLD steady median {statistics.median(old_all):.3f}"
    )


if __name__ == "__main__":
    main()
