#!/usr/bin/env python3
"""SQLite dialect-TWIN spot check — the second half of the second-oracle
pair (see scripts/sqlite_spotcheck.py, which replays PORTABLE oracle SQL
verbatim in SQLite; this script covers gate queries whose DuckDB oracle
is NOT portable — ILIKE, DECIMAL-exact aggregates, window tie rules —
by hand-translating each to an equivalent SQLite-dialect twin).

Usage: python3 scripts/triple_check.py <sfDir> <verifyOutDir>

Exact compare for ints/strings; floats to 1e-9 relative (SQLite has no
DECIMAL, so dec4-rounded aggregates take a different arithmetic route by
design — agreement to 1e-9 is the cross-engine *semantic* check, the
bit-exact contract stays DuckDB's job). Per-query failures are caught
and tallied; the script always prints its full pass/fail summary.
"""
import math
import sys
from pathlib import Path
import sqlite3

import duckdb

# (table, columns) actually needed — loaded column-pruned
LOADS = {
    "lineitem": ["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"],
    "part": ["p_partkey", "p_name"],
    "orders": ["o_orderkey", "o_orderstatus", "o_totalprice"],
}

# SQLite-dialect twins of NON-portable DuckDB oracles (same output column
# names as the gate entry). Portable oracles are sqlite_spotcheck.py's job.
QUERIES = {
    # DECIMAL-exact in the gate; plain double sums here (tolerance compare)
    "q_sum_avg": """
        SELECT round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_quantity) / count(l_quantity), 4) AS avg_qty,
               round(sum(l_extendedprice), 4) AS sum_price,
               round(sum(l_extendedprice) / count(l_extendedprice), 4) AS avg_price
        FROM lineitem""",
    # the reference keeps SQLite's ASCII-case-insensitive LIKE — here the
    # check runs on the REAL thing, not DuckDB's ILIKE emulation of it
    "q_like_ci": """
        SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%RING%'
        ORDER BY p_partkey""",
    # NULL-first ASC is SQLite's default, matching Spark — semantic parity
    "q_sort_topk": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 100""",
    "q_limit_head": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 20""",
    "q_mode": """
        SELECT l_quantity AS value, count(*) AS cnt FROM lineitem
        GROUP BY 1
        HAVING count(*) = (SELECT count(*) AS c FROM lineitem
                           GROUP BY l_quantity ORDER BY c DESC LIMIT 1)
        ORDER BY value""",
}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    duck = duckdb.connect()
    lite = sqlite3.connect(":memory:")
    for t, cols in LOADS.items():
        rows = duck.sql(
            f"SELECT {', '.join(cols)} FROM '{sf_dir}/{t}.parquet'").fetchall()
        lite.execute(f"CREATE TABLE {t} ({', '.join(cols)})")
        lite.executemany(
            f"INSERT INTO {t} VALUES ({', '.join('?' * len(cols))})", rows)

    n_pass = n_fail = 0
    for name, sql in QUERIES.items():
        try:
            spark = duck.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark.fetchall(), spark.columns)
            cur = lite.execute(sql)
            l_cols, l_rows = canon(cur.fetchall(),
                                   [d[0] for d in cur.description])
        except Exception as e:  # missing dump, renamed query, SQL error
            print(f"✗ {name}: ERROR: {e}")
            n_fail += 1
            continue
        if s_cols != l_cols:
            print(f"✗ {name}: COLUMN MISMATCH spark={s_cols} sqlite={l_cols}")
            n_fail += 1
            continue
        ok = len(s_rows) == len(l_rows) and all(
            all(close(a, b) for a, b in zip(sr, lr))
            for sr, lr in zip(s_rows, l_rows))
        if ok:
            print(f"✓ {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            print(f"✗ {name}: VALUE MISMATCH ({len(s_rows)} vs {len(l_rows)} rows)")
            for i, (g, e) in enumerate(zip(s_rows, l_rows)):
                if not all(close(a, b) for a, b in zip(g, e)):
                    print(f"    first diff row {i}: spark={g} sqlite={e}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail (sqlite dialect twins; "
          "portable oracles: scripts/sqlite_spotcheck.py)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
