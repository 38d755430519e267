"""Driver-style contract check: run each queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, compare row count,
column names, and value hash (columns sorted by name, rows sorted by all
columns — the driver's canonicalization). Usage:

    python scripts/check_contracts.py [sf_dir] [key ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    body = pdf.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.md5(body).hexdigest(), len(pdf), list(pdf.columns)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from openie_with_entities_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("check_contracts", cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    keys = sys.argv[2:] or list(qs)
    n_bad = 0
    for key in keys:
        try:
            s_pdf = qs[key](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {key}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if key not in oracles:
            print(f"ROWS {key}: {len(s_pdf)} rows (no oracle)")
            continue
        try:
            o_pdf = con.execute(oracles[key]).df()
        except Exception as e:
            print(f"FAIL {key}: oracle error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        hs, ns, cs = canon(s_pdf)
        ho, no, co = canon(o_pdf)
        ok = hs == ho and ns == no and cs == co
        if not ok:
            n_bad += 1
            print(f"FAIL {key}: rows {ns}/{no} cols_match={cs == co} hash={hs == ho}")
            if cs != co:
                print(f"  spark cols {cs}\n  oracle cols {co}")
            else:
                merged = s_pdf[sorted(s_pdf.columns)].merge(
                    o_pdf[sorted(o_pdf.columns)], how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(8).to_string())
        else:
            print(f"OK   {key}: {ns} rows")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
