#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `graft.Verify` wrote: one parquet dir per query
plus oracle_sql.json. For each query: run the oracle SQL in DuckDB over
the sf parquet tables, load the Spark result, sort columns by name,
and compare values (exactly; row order both as-is and sorted).

Driver-side-only tooling (duckdb/pandas/pyarrow): NOT part of the Scala
library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# RULE (round-5 lesson, q_drift_ks): declared result schemas must NOT
# contain DECIMAL(p,s) columns. The driver's hasher canonicalizes
# Spark's decimal128 parquet differently from DuckDB's decimal result,
# so a value-identical decimal column can still hash-mismatch at the
# gate — and this local canon used to widen decimals to float64, hiding
# the seam (local said 243/243 while the driver said 242/243). Emit
# BIGINT (with a documented range bound) or the canonical digit STRING
# at the report edge; keep exact decimal arithmetic internal. The one
# sanctioned decimal query, q_decimal_amount, already CASTs to
# VARCHAR/string on both sides. decimal_cols() below makes this local
# gate fail loudly on any new decimal output column.
def decimal_cols(parquet_glob: str) -> list:
    import pyarrow.dataset as pads
    import pyarrow as pa
    schema = pads.dataset(parquet_glob.replace("/*.parquet", "")).schema
    return [f.name for f in schema
            if pa.types.is_decimal(f.type)]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to microseconds (spark writes us, duckdb ns)
    # and widen ints/floats (spark row_number is int32, duckdb int64)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if isinstance(v, (list, tuple)) else v)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            dec = decimal_cols(f"{out_dir}/{name}")
            if dec:
                failures += 1
                print(f"FAIL {name}: DECIMAL output column(s) {dec} — "
                      "driver hasher is not decimal-stable; emit BIGINT "
                      "or STRING at the report edge (see RULE above)")
                continue
            expect = canon(con.execute(sql).fetchdf())
            got = canon(
                duckdb.connect().execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            schema_ok = list(expect.columns) == list(got.columns)
            if not schema_ok:
                print(f"FAIL {name}: columns {list(got.columns)} != "
                      f"{list(expect.columns)}")
                failures += 1
                continue
            ordered_ok = expect.equals(got)
            sorted_ok = (expect.sort_values(by=list(expect.columns))
                         .reset_index(drop=True)
                         .equals(got.sort_values(by=list(got.columns))
                                 .reset_index(drop=True)))
            if ordered_ok:
                print(f"PASS {name} ({len(got)} rows)")
            elif sorted_ok:
                print(f"PASS(unordered-only) {name} ({len(got)} rows)")
            else:
                failures += 1
                print(f"FAIL {name}: values differ")
                merged = expect.compare(got) if expect.shape == got.shape \
                    else None
                if merged is not None and not merged.empty:
                    print(merged.head(10))
                else:
                    print(f"  expect {expect.shape} vs got {got.shape}")
                    print("  expect head:", expect.head(3).to_dict("records"))
                    print("  got head:   ", got.head(3).to_dict("records"))
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {e}")
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
