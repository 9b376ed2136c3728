#!/usr/bin/env python3
"""Local dev-only mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - load the Spark result parquet from <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with the sfDir tables registered as views
  - sort columns by name, compare shape + values.

NOT part of the Scala engine; uses the driver-side python (duckdb/pandas).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)]


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_class(t: str) -> str:
    t = t.upper()
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    return t


def type_parity(con, sql, out_dir, name):
    """The driver hashes pandas frames, so a DuckDB HUGEINT column
    (int128 -> float64 in pandas) hash-mismatches a Spark BIGINT even
    when every value is equal. Fail any oracle column that is HUGEINT,
    or whose int/float class differs from the Spark parquet column."""
    ora = con.execute(f"DESCRIBE {sql}").fetchdf()
    spk = con.execute(
        f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    ot = dict(zip(ora.column_name, ora.column_type))
    st = dict(zip(spk.column_name, spk.column_type))
    issues = []
    for c, t in ot.items():
        if "HUGEINT" in t.upper():
            issues.append(f"{c}: oracle {t} (pandas float64 — CAST the "
                          "oracle expression to BIGINT)")
        elif c in st and type_class(t) != type_class(st[c]):
            issues.append(f"{c}: oracle {t} vs spark {st[c]}")
    return issues


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            mine = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            oracle = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}")
            n_fail += 1
            continue
        ty = type_parity(con, sql, out_dir, name)
        if ty:
            print(f"FAIL {name}: type parity: " + "; ".join(ty))
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
            n_fail += 1
            continue
        bad = None
        ma, oa = mine.to_numpy(), oracle.to_numpy()
        for i in range(len(mine)):
            for j in range(len(mine.columns)):
                if not cells_equal(ma[i, j], oa[i, j]):
                    bad = (i, mine.columns[j], ma[i, j], oa[i, j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: mine={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
