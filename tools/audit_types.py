"""Audit Spark result dtypes vs DuckDB oracle result types per column.

Round 1's two driver hash failures (p2/f21) were pure type drift: the
oracle SQL's bare integer ``sum()`` came back as DuckDB HUGEINT (int128)
while Spark produced BIGINT, and the driver's value hasher renders the
two differently even though the values are equal. The local value
checker (tools/check_correctness.py) compares through ``str()`` and so
cannot see this class of bug.

This tool catches it statically: for every registered oracle it runs
``DESCRIBE <sql>`` on DuckDB (no execution of the query body) and reads
the Spark DataFrame schema (no action), canonicalizes both type systems,
and flags any column whose canonical types differ. Flagged classes:

- DuckDB HUGEINT anywhere (always wrong: Spark has no int128)
- decimal scale mismatch (renders "1.50" vs "1.500")
- decimal vs double (renders "1.5" vs "1.500000")
- float32 vs float64 (repr drift)
- date/timestamp vs string
- int vs float/bool

Usage: python tools/audit_types.py [query_name ...]
"""

from __future__ import annotations

import re
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "byte", "short", "long"}


def canon(t: str) -> str:
    """Collapse a Spark dtype / DuckDB DESCRIBE type to a hash-render class."""
    t = t.strip().lower()
    # arrays / lists
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return f"list<{canon(m.group(1))}>"
    m = re.fullmatch(r"(.*)\[\]", t)
    if m:
        return f"list<{canon(m.group(1))}>"
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
    if m:
        return f"dec(s={m.group(2)})"
    if t in INT_TYPES:
        return "int"
    if t == "hugeint":
        return "HUGEINT"  # loud: never acceptable
    if t in {"float", "real"}:
        return "f32"
    if t == "double":
        return "f64"
    if t in {"varchar", "string", "text"}:
        return "str"
    if t in {"boolean", "bool"}:
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("struct"):
        return t  # compare structs textually
    return t


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from x17a5_spark.queries import registry
    from x17a5_spark.session import get_spark

    queries, oracles = registry()
    wanted = sys.argv[1:] or [n for n in queries if n in oracles]
    spark = get_spark("audit_types")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = 0
    for name in wanted:
        if name not in oracles:
            print(f"{name}: no oracle (rows-only) — skipped")
            continue
        try:
            duck = {
                r[0]: canon(r[1])
                for r in con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            }
            sp = {c: canon(t) for c, t in queries[name](spark, SF_DIR).dtypes}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        diffs = []
        for col in sorted(set(duck) | set(sp)):
            d, s = duck.get(col), sp.get(col)
            if d != s:
                diffs.append(f"{col}: duck={d} spark={s}")
        if diffs:
            bad += 1
            print(f"{name}: TYPE_DRIFT  " + "; ".join(diffs))
        else:
            print(f"{name}: ok")
    print(f"\n{'PASS' if bad == 0 else 'FAIL'} ({bad} drifting)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
