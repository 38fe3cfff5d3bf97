"""Local replica of the driver's correctness gate: run each Spark query
and its DuckDB oracle, sort columns by name + rows by value, compare.

Reports BOTH bit-exact equality (what a value-hash would see) and
approximate float equality (to distinguish real bugs from float jitter).

Round-9 addition: a REPRESENTATION-STRICT hash over the canonicalized
frame (str-rendered cells, so int64 1000637000000 != float64
1000637000000.0).  The r8 PQ rows were value-EXACT here yet red at the
driver because DuckDB list_sum returns HUGEINT (surfaced as float64)
against Spark's int64 — a dtype drift the old float-tolerant compare
masked.  EXACT now additionally requires the strict hash to match; a
value-equal-but-representation-drifted result reads REPR_MISMATCH, so
local green implies driver green again.
"""

from __future__ import annotations

import glob
import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def strict_hash(df: pd.DataFrame) -> str:
    """Representation-sensitive value hash of a canonicalized frame:
    every cell str-rendered with its dtype-native formatting, so an
    int64 column and a float64 column holding equal values hash
    DIFFERENTLY (the driver's hash is representation-strict too)."""
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c]:
            h.update(str(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    out: dict = {"rows": (len(spark_pdf), len(oracle_pdf))}
    s, o = canon(spark_pdf), canon(oracle_pdf)
    out["cols"] = (list(s.columns), list(o.columns))
    if list(s.columns) != list(o.columns):
        out["verdict"] = "COLUMN_MISMATCH"
        return out
    if len(s) != len(o):
        out["verdict"] = "ROWCOUNT_MISMATCH"
        return out
    exact = True
    approx = True
    first_diff = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype(float)
            ov = ov.astype(float)
            both_nan = sv.isna() & ov.isna()
            eq = (sv == ov) | both_nan
            if not eq.all():
                exact = False
                close = both_nan | sv.combine(
                    ov, lambda a, b: (
                        (isinstance(a, float) and isinstance(b, float))
                        and (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                             or (math.isnan(a) and math.isnan(b)))
                    )
                )
                if not close.all():
                    approx = False
                if first_diff is None:
                    i = (~eq).idxmax()
                    first_diff = (c, sv[i], ov[i])
        else:
            sn = sv.isna()
            on_ = ov.isna()
            eq = (sn & on_) | (sv.fillna("\0").astype(str) == ov.fillna("\0").astype(str))
            if not eq.all():
                exact = False
                approx = False
                if first_diff is None:
                    i = (~eq).idxmax()
                    first_diff = (c, sv[i], ov[i])
    out["verdict"] = "EXACT" if exact else ("APPROX" if approx else "VALUE_MISMATCH")
    if exact:
        # values agree under dtype-tolerant compare; now require the
        # driver-style representation-strict hash too (int != float)
        out["strict_hash_match"] = strict_hash(s) == strict_hash(o)
        if not out["strict_hash_match"]:
            out["verdict"] = "REPR_MISMATCH"
            for c in s.columns:
                if str(s[c].dtype) != str(o[c].dtype):
                    out.setdefault("dtype_diffs", []).append(
                        (c, str(s[c].dtype), str(o[c].dtype))
                    )
    if first_diff:
        out["first_diff"] = first_diff
    return out


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from img2dataset_spark.queries import ALL_QUERIES as QUERIES
    from img2dataset_spark.oracles import ORACLES

    con = duckdb_conn(sf_dir)
    results = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            if name not in ORACLES:
                results[name] = {"verdict": "NO_ORACLE", "rows": (len(spark_pdf),)}
                continue
            oracle_pdf = con.execute(ORACLES[name]).fetchdf()
            results[name] = compare(spark_pdf, oracle_pdf)
        except Exception as e:
            results[name] = {"verdict": "ERROR", "error": f"{type(e).__name__}: {e}"}
    return results


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from img2dataset_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(shuffle_partitions=8)
    res = run_all(spark, sf_dir, names)
    width = max(len(n) for n in res)
    fails = 0
    for name, r in res.items():
        v = r["verdict"]
        if v not in ("EXACT",):
            fails += 1
        line = f"{name:<{width}}  {v}"
        if v not in ("EXACT", "NO_ORACLE"):
            line += f"  {r}"
        print(line)
    print(f"\n{len(res) - fails}/{len(res)} EXACT")
