"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on one sf_dir; compare row count, schema
(column names) and an order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name...]
       PYTHONPATH=/root/repo python tools/check_oracles.py --fast

``--fast``: run ALL queries at sf0.001 in one process and write the results
to CORRECTNESS_LOCAL.json (same per-query shape as the driver's
CORRECTNESS_r{N}.json) — insurance so a time-budgeted driver run can never
leave part of the registry unattested.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.astype(str)
        elif s.dtype.kind in "iu":
            df[c] = s.astype(np.int64)
        elif s.dtype.kind == "b":
            df[c] = s.astype(bool)
        elif s.dtype.kind == "f":
            df[c] = np.round(s.astype(np.float64), 9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(df.astype(str), index=False).sum())


def main(record_path: str | None = None) -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(ex).__name__}: {ex}"}
            continue
        el = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows ({el:.1f}s)")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": int(len(got)),
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        want = canon(con.sql(oracles[name]).df())
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(f"{status} {name}: rows {len(got)}/{len(want)} schema={ok_schema} "
              f"hash={ok_hash} ({el:.1f}s)")
        record[name] = {"rows_match": bool(ok_rows),
                        "schema_match": bool(ok_schema),
                        "hash_match": bool(ok_hash),
                        "spark_rows": int(len(got)),
                        "oracle_rows": int(len(want)), "err": None}
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print("   got ", list(got.columns))
                print("   want", list(want.columns))
            elif ok_rows:
                neq = ~(got.astype(str) == want.astype(str)).all(axis=1)
                print("   first diffs:")
                print(pd.concat([got[neq].head(3), want[neq].head(3)],
                                keys=["got", "want"]))
    print("FAILURES:", failures or "none")
    if record_path:
        with open(record_path, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {record_path} ({len(record)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    import os

    import ray

    fast = "--fast" in sys.argv
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    rec = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json") if fast else None
    for a in sys.argv[1:]:  # --out=PATH: record any run (e.g. sf0.1 spot-gate)
        if a.startswith("--out="):
            rec = a.split("=", 1)[1]
    rc = main(record_path=rec)
    ray.shutdown()
    sys.exit(rc)
