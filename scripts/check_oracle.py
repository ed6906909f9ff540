"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry and, where an ``oracle_sql()`` entry
exists, the SQL on DuckDB over the same parquet tables; compares row
count, column names, and order-insensitive values (columns sorted by
name, rows sorted, exact equality). Usage:

    python -m scripts.check_oracle [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__ray_entry__.py"),
    )
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in entrymod.queries().items():
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(got)} rows, "
                  f"cols={list(got.columns)})")
            continue
        want = canon(con.execute(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # serialized-representation equality FIRST (the driver hashes the
        # serialized values, so pandas Int64(5) != DuckDB float64 5.0 even
        # when every value is equal — r03's click_purchase_matrix fail)
        got_ser = got.to_csv(index=False)
        want_ser = want.to_csv(index=False)
        # exact value equality after dtype coercion (semantic check)
        want_c = want.astype(got.dtypes.to_dict(), errors="ignore")
        eq = got.equals(want_c)
        if not eq:
            diff = (got != want_c).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())} mismatched rows; first:")
            print(pd.concat([got[diff].head(3), want_c[diff].head(3)],
                            keys=["ray", "sql"]))
            failures += 1
        elif got_ser != want_ser:
            bad = next((c for c in got.columns
                        if got[c].to_csv(index=False)
                        != want[c].to_csv(index=False)), "?")
            print(f"FAIL  {name}: values equal but serialized "
                  f"representation differs (driver would hash-fail); "
                  f"first differing column: {bad} "
                  f"(ray dtype {got[bad].dtype} vs sql {want[bad].dtype})")
            failures += 1
        else:
            print(f"OK    {name}: {len(got)} rows match oracle exactly")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(main(sf))
