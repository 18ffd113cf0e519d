"""Local replica of the driver's DuckDB-oracle correctness gate:
row-count + schema + order-insensitive value comparison between each
``queries()`` entry and its ``oracle_sql()`` SQL on the same parquet
tables. Stricter than the driver where possible: exact value equality
(floats included), so any cross-engine nondeterminism surfaces here
first."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonicalize list/array cells so sorting works
    for c in pdf.columns:
        if pdf[c].dtype == object:
            sample = pdf[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (list, np.ndarray, tuple)
            ):
                pdf[c] = pdf[c].map(
                    lambda x: tuple(x) if x is not None else None
                )
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return pdf


def compare(spark_df, sql: str, con: duckdb.DuckDBPyConnection) -> dict:
    s = _normalize(spark_df.toPandas())
    o = _normalize(con.sql(sql).df())
    report: dict = {"rows": (len(s), len(o)), "ok": True, "issues": []}
    if len(s) != len(o):
        report["ok"] = False
        report["issues"].append(f"row count {len(s)} != {len(o)}")
        return report
    if list(s.columns) != list(o.columns):
        report["ok"] = False
        report["issues"].append(f"columns {list(s.columns)} != {list(o.columns)}")
        return report
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(float).to_numpy()
            bv = b.astype(float).to_numpy()
            nan_match = np.array_equal(np.isnan(av), np.isnan(bv))
            exact = nan_match and np.array_equal(
                av[~np.isnan(av)], bv[~np.isnan(bv)]
            )
            if not exact:
                close = nan_match and np.allclose(
                    av[~np.isnan(av)], bv[~np.isnan(bv)], rtol=1e-12, atol=1e-9
                )
                maxdiff = (
                    float(np.max(np.abs(av[~np.isnan(av)] - bv[~np.isnan(bv)])))
                    if nan_match and len(av)
                    else math.inf
                )
                report["ok"] = False
                report["issues"].append(
                    f"float col {c}: exact mismatch (close={close}, maxdiff={maxdiff})"
                )
        else:
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                report["ok"] = False
                report["issues"].append(
                    f"col {c}: {int(neq.sum())} mismatches, first at "
                    f"{neq.idxmax() if neq.any() else '?'}: "
                    f"{a[neq].head(3).tolist()} vs {b[neq].head(3).tolist()}"
                )
    return report
