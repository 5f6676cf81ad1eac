"""Capture `.explain("formatted")` for a list of queries into
plans/r13/<code>_<suffix>.txt — the optimization round's before/after
plan evidence (guide §1.4/§7.2).

Usage: python tools/capture_plans_r13.py <suffix> code1,code2,...
       (codes are the short "d3"/"e7" prefixes or full names)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x17a5_spark.cache import release_stage_caches  # noqa: E402
from x17a5_spark.queries import registry  # noqa: E402
from x17a5_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    suffix = sys.argv[1]
    want = {s.strip() for s in sys.argv[2].split(",") if s.strip()}
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_plans_r13")
    queries, _ = registry()
    names = [
        n for n in queries if n in want or n.split("_")[0] in want
    ]
    missing = want - set(names) - {n.split("_")[0] for n in names}
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name.split('_')[0]}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} — explain('formatted')\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        release_stage_caches()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
