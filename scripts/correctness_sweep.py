"""Full driver-style correctness sweep over EVERY registered query.

The external driver samples only its legacy 50-query list (VERDICT r3
item 5); this script runs the complete ``queries()`` registry at sf0.01
against ``oracle_sql()`` through DuckDB with the driver's exact compare
contract — sort columns by name, sort rows by all columns, compare row
count + schema + values — and emits one CORRECTNESS-shaped JSON file
plus a summary line appended to PROGRESS.jsonl.

Usage:  python scripts/correctness_sweep.py [--sf /root/testdata/sf0.01]
                                            [--out CORRECTNESS_full_r4.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if pd.api.types.is_numeric_dtype(out[c]) and not pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype("float64")
    return out.sort_values(cols).reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    # floats in this repo's query contract are pre-rounded int-like
    # (floor(x*scale+0.5) columns), so repr-stability is not a concern
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_full_r4.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names; merges rows into --out "
                         "instead of rewriting it")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        keep = {n.strip() for n in args.only.split(",") if n.strip()}
        missing = keep - set(qs)
        if missing:
            raise SystemExit(f"unknown queries: {sorted(missing)}")
        qs = {n: f for n, f in qs.items() if n in keep}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    results: dict[str, dict] = {}
    n_green = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        row: dict = {"rows_match": None, "schema_match": None, "hash_match": None,
                     "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            rdf = _to_df(fn(args.sf))
            row["spark_rows"] = int(len(rdf))
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                row["oracle_rows"] = int(len(odf))
                row["schema_match"] = sorted(rdf.columns) == sorted(odf.columns)
                row["rows_match"] = len(rdf) == len(odf)
                if row["schema_match"] and row["rows_match"]:
                    r, o = _canon(rdf), _canon(odf)
                    try:
                        pd.testing.assert_frame_equal(r, o, check_dtype=False,
                                                      check_exact=False, rtol=0, atol=1e-9)
                        row["hash_match"] = True
                    except AssertionError:
                        row["hash_match"] = _value_hash(r) == _value_hash(o)
                else:
                    row["hash_match"] = False
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
                n_green += ok
                n_fail += not ok
            else:
                row["err"] = "no_oracle"
                ok = len(rdf) > 0
                n_rows_only += ok
                n_fail += not ok
        except Exception as e:  # noqa: BLE001 — sweep must finish
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            n_fail += 1
        row["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = row
        status = ("GREEN" if row["hash_match"]
                  else "rows_only" if row["err"] == "no_oracle" and row["spark_rows"]
                  else "FAIL")
        print(f"{name:40s} {status:9s} rows={row['spark_rows']} {row['sec']}s",
              flush=True)

    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    summary = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "event": "full_correctness_sweep",
        "sf": args.sf,
        "n_queries": len(qs),
        "triple_green": n_green,
        "rows_only_ok": n_rows_only,
        "failed": n_fail,
        "out": args.out,
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
