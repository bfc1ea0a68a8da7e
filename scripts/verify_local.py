"""Local replica of the driver's correctness gate: run every queries()
entry at the given SF, compare against oracle_sql() via DuckDB
(row-count + schema-width + order-insensitive value hash).

Usage: python scripts/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _pd_cell(v) -> str:
    """str() a pandas cell the way the driver's canon sees it — NO
    int-coercion of whole floats, so dtype artifacts (DuckDB HUGEINT →
    float64 '5000.0' vs Spark int64 '5000') fail HERE instead of only in
    the driver run."""
    if v is None:
        return "NULL"
    try:
        import pandas as pd

        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays: pd.isna is elementwise; fall through to str()
    return str(v)


def pandas_hash(pdf) -> str:
    """Driver-faithful canon: pandas frame, columns sorted by name, rows as
    stringified lines, order-insensitive hash. The driver converts both
    sides to pandas (Spark toPandas vs DuckDB fetchdf), where integer
    DuckDB sums arrive as float64 — the legacy fetchall() path hid that."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cols = [[_pd_cell(v) for v in pdf[c]] for c in pdf.columns]
    lines = sorted("|".join(cells) for cells in zip(*cols)) if cols else []
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from etl_ipl_data_analysis_pipeline_spark import get_spark

    spark = get_spark("verify-local", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s) [rows-only]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        try:
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: toPandas error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        try:
            sph, oph = pandas_hash(spdf), pandas_hash(opdf)
            ok_pd = sph == oph
            pd_note = "" if ok_pd else f"; PANDAS-CANON hash {sph} vs {oph}"
        except Exception as e:
            ok_pd = False
            pd_note = f"; PANDAS-CANON error: {e}"
        if ok_count and ok_cols and ok_hash and ok_pd:
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(srows)} vs {len(orows)}; "
                f"cols {sorted(scols)} vs {sorted(ocols)}; hash {sh} vs {oh}{pd_note}"
            )
            n_fail += 1
            failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
