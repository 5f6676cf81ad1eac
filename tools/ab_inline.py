"""Single-JVM interleaved A/B of one query between the working tree and
HEAD (or any git rev): loads the rev's x17a5_spark package copy into an
isolated module namespace, constructs both DataFrames in ONE session,
and alternates timed noop-sink executions NEW,OLD,NEW,OLD,... so host
throttling waves hit both variants equally (the r13 session-3 protocol;
JVM-to-JVM drift on this VM exceeded the effects under test).

Usage: python tools/ab_inline.py <query_name> [reps=7] [rev=HEAD]
Prints medians + all samples. Stage caches are released between runs
exactly as bench.py does.
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    rev = sys.argv[3] if len(sys.argv) > 3 else "HEAD"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_root = tempfile.mkdtemp(prefix="ab_old_")
    subprocess.run(
        f"git -C {repo} archive {rev} x17a5_spark | tar -x -C {old_root}",
        shell=True, check=True,
    )
    # the OLD package under an alias so both import side by side
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

    spark = get_spark("ab_inline")
    qn, _ = reg_new()
    qo, _ = reg_old()

    def run(fn, rel) -> float:
        df = fn(spark, sf_dir)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        rel()
        spark.catalog.clearCache()
        return dt

    # warmups, both variants
    run(qn[name], rel_new)
    run(qo[name], rel_old)
    new_s, old_s = [], []
    for _ in range(reps):
        new_s.append(run(qn[name], rel_new))
        old_s.append(run(qo[name], rel_old))
    print(
        f"{name}: NEW median {statistics.median(new_s):.3f} "
        f"OLD median {statistics.median(old_s):.3f}\n"
        f"  new samples {[round(x, 3) for x in new_s]}\n"
        f"  old samples {[round(x, 3) for x in old_s]}"
    )


if __name__ == "__main__":
    main()
