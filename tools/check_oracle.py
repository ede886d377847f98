"""Local stand-in for the driver's correctness gate: runs every query in
__spark_entry__.queries() against its oracle_sql() via DuckDB at a given
scale factor and compares row-count, column names, and an order-insensitive
value comparison (exact on strings/ints/bools/timestamps, exact on doubles
too — our determinism conventions make doubles bit-identical).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kalytical_spark import domain  # noqa: E402
from kalytical_spark.session import get_spark  # noqa: E402


def canon(v):
    """Canonical comparable form of one cell."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def _key(row):
    return tuple((x is None, str(x)) for x in row)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=_key)
    return [cols[i] for i in order], out


def compare(name, spark_df, con, oracle, verbose=False):
    t0 = time.time()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    t_duck = time.time() - t0

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"ROWS spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        _, sn = normalize(s_cols, s_rows)
        _, dn = normalize(d_cols, d_rows)
        ndiff = sum(1 for a, b in zip(sn, dn) if a != b)
        if ndiff:
            problems.append(f"VALUES {ndiff}/{len(sn)} rows differ")
            if verbose:
                shown = 0
                for a, b in zip(sn, dn):
                    if a != b and shown < 5:
                        print(f"    spark: {a}\n    duck : {b}")
                        shown += 1
    status = "OK" if not problems else "FAIL"
    print(f"{status:4s} {name:32s} rows={len(s_rows):6d} spark={t_spark:5.1f}s duck={t_duck:5.1f}s"
          + ("  " + "; ".join(problems) if problems else ""))
    return not problems


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    con = duckdb.connect()
    for tname in domain.BASE_TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    spark = get_spark("check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = bad = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        oracle = oracles.get(name)
        if oracle is None:
            df = fn(spark, sf_dir)
            n = df.count()
            print(f"SKIP {name:32s} rows={n:6d} (no oracle; rows-only)")
            skipped += 1
            continue
        try:
            if compare(name, fn(spark, sf_dir), con, oracle, verbose=True):
                ok += 1
            else:
                bad += 1
        except Exception as e:
            print(f"ERR  {name:32s} {type(e).__name__}: {str(e)[:300]}")
            bad += 1
    print(f"\n{ok} ok, {bad} failing, {skipped} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
