"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` callable at the given sf_dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet tables,
and compares row count, column-name set and an order-insensitive value
multiset (floats rounded).  Usage::

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NA:
                norm.append("<null>")
            elif isinstance(v, float):
                norm.append(f"{v:.9g}")
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat())
            else:
                norm.append(str(v))
        rows.append(tuple(norm))
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {ex!r}")
            failures.append(name)
            continue
        dt = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"okNOSQL {name}: rows={len(mine)} ({dt:.1f}s, rows-only check)")
            if len(mine) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            theirs = con.sql(sql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {ex!r}")
            failures.append(name)
            continue
        problems = []
        if len(mine) != len(theirs):
            problems.append(f"rowcount {len(mine)} != {len(theirs)}")
        if sorted(map(str, mine.columns)) != sorted(map(str, theirs.columns)):
            problems.append(f"columns {sorted(mine.columns)} != {sorted(theirs.columns)}")
        if not problems:
            a, b = normalize(mine), normalize(theirs)
            if a != b:
                diff_a = [r for r in a if r not in set(b)][:3]
                diff_b = [r for r in b if r not in set(a)][:3]
                problems.append(f"values differ; mine-only={diff_a} oracle-only={diff_b}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(mine)} ({dt:.1f}s)")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
