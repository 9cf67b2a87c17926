"""Self-check: run every __spark_entry__ query against its DuckDB oracle,
mimicking the driver's comparison (row count + schema + order-insensitive
value hash over columns sorted by name).

Both sides are fetched through Arrow→pandas so type coercions are the same
ones the driver sees (e.g. DuckDB HUGEINT → float64) instead of fetchall()'s
lossy HUGEINT→int coercion, and the value normalizer is TYPE-SENSITIVE: an
int64 0 and a float64 0.0 hash differently, reproducing the driver's
a05/a16/w04 round-1 mismatches.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    # Unwrap numpy scalars so rendering depends on the logical value+type,
    # not on numpy repr quirks.
    if hasattr(v, "item") and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except (AttributeError, ValueError):
            pass
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        # repr keeps int/float distinct ('0' vs '0.0'): type-sensitive like
        # the driver; shortest-roundtrip repr is deterministic per value.
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def df_rows(pdf):
    """pandas DataFrame → list of tuples, NaN→None preserved per-cell."""
    cols = list(pdf.columns)
    out = []
    for rec in pdf.itertuples(index=False, name=None):
        row = []
        for v in rec:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            else:
                row.append(v)
        out.append(tuple(row))
    return out, cols


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            srows, scols = df_rows(spdf)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetch_arrow_table().to_pandas()
            drows, dcols = df_rows(dpdf)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sdt = {c: spdf[c].dtype for c in scols}
            ddt = {c: dpdf[c].dtype for c in dcols}
            kind_diff = {
                c: (str(sdt[c]), str(ddt[c]))
                for c in sdt
                if sdt[c].kind != ddt[c].kind
            }
            width_diff = {
                c: (str(sdt[c]), str(ddt[c]))
                for c in sdt
                if sdt[c].kind == ddt[c].kind and sdt[c] != ddt[c]
            }
            if kind_diff:
                # int-vs-float (etc.) is exactly the HUGEINT class of driver
                # hash mismatch — hard failure.
                problems.append(f"dtype kind mismatch {kind_diff}")
            if width_diff:
                print(f"warn  {name}: dtype width differs {width_diff}")
            sh = value_hash(srows, scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show first differing line for debugging
                so = sorted(
                    "\x01".join(
                        _norm(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                do = sorted(
                    "\x01".join(
                        _norm(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                )
                for a, b in zip(so, do):
                    if a != b:
                        print(f"      spark: {a[:200]}")
                        print(f"      duck : {b[:200]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
