#!/usr/bin/env python3
"""Second-engine oracle spot check: Spark = DuckDB = SQLite.

Usage: python3 scripts/sqlite_spotcheck.py <sfDir> <verifyOutDir>

The 199-query gate compares Spark against DuckDB; any DuckDB-specific
semantic the suite had silently normalized to would be invisible there.
This script replays a representative portable-SQL subset of the oracle
queries against SQLite (the reference's own engine) as a THIRD engine and
compares all three: the Spark dump (written by graft.Verify), the DuckDB
oracle result, and the SQLite result over the same rows.

The subset is restricted to oracle SQL in the dialect intersection
(no list functions, no `//`, no `::`, no regex, no DECIMAL-exact sums —
SQLite has no decimal type, so decimal-convention queries are out of
scope by construction). Tables are loaded into SQLite row-for-row from
the same parquet via DuckDB.
"""
import json
import sqlite3
import sys
from pathlib import Path

import duckdb

# (query name, tables it needs) — portable-dialect subset covering the
# reference surface classes: filters, IN/BETWEEN, aggregates, mode ties,
# value_counts ordering, sort+topk windows, a join, and integer sums
SPOT = {
    "q_len": ["lineitem"],
    "q_count_nulls": ["events"],
    "q_minmax_num": ["lineitem"],
    "q_minmax_text": ["customer"],
    "q_value_counts": ["lineitem"],
    "q_isin": ["customer"],
    "q_between": ["orders"],
    "q_filter_eq": ["customer"],
    "q_filter_compound": ["lineitem"],
    "q_sql_join": ["customer", "nation", "region"],
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(rows):
    """Cross-engine value normalization: ints may come back as int64 vs
    Python int (equal anyway); floats compared exactly (the spot set is
    integer/string-only in its outputs)."""
    return [tuple(float(v) if isinstance(v, float) else v for v in r)
            for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    lite = sqlite3.connect(":memory:")
    needed = sorted({t for ts in SPOT.values() for t in ts})
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for t in needed:
        # ts columns land as ISO strings in SQLite; the spot queries never
        # do timestamp arithmetic, only equality/NULL tests
        cur = con.sql(f"SELECT * FROM {t}")
        cols = cur.columns
        rows = cur.fetchall()
        lite.execute(f"CREATE TABLE {t} ({', '.join(cols)})")
        lite.executemany(
            f"INSERT INTO {t} VALUES ({', '.join('?' * len(cols))})",
            [tuple(str(v) if hasattr(v, "isoformat") else v for v in r)
             for r in rows])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    n_pass = n_fail = 0
    for name in sorted(SPOT):
        sql = oracle[name]
        spark = con.sql(f"SELECT * FROM '{Path(out_dir, name)}/*.parquet'")
        s_cols, s_rows = canon(spark.fetchall(), spark.columns)
        duck = con.sql(sql)
        d_cols, d_rows = canon(duck.fetchall(), duck.columns)
        try:
            lc = lite.execute(sql)
            l_cols, l_rows = canon(lc.fetchall(),
                                   [d[0] for d in lc.description])
        except Exception as e:
            print(f"✗ {name}: SQLITE ERROR: {e}")
            n_fail += 1
            continue
        ok = (s_cols == d_cols == [c.lower() for c in l_cols] or
              s_cols == d_cols == l_cols)
        ok = ok and norm(s_rows) == norm(d_rows) == norm(l_rows)
        if ok:
            print(f"✓ {name}: {len(s_rows)} rows agree across "
                  f"spark/duckdb/sqlite")
            n_pass += 1
        else:
            print(f"✗ {name}: 3-ENGINE MISMATCH")
            for i, (a, b, c) in enumerate(zip(norm(s_rows), norm(d_rows),
                                              norm(l_rows))):
                if not (a == b == c):
                    print(f"    row {i}: spark={a} duckdb={b} sqlite={c}")
                    break
            if not (len(s_rows) == len(d_rows) == len(l_rows)):
                print(f"    rows: spark={len(s_rows)} duckdb={len(d_rows)} "
                      f"sqlite={len(l_rows)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail (3-engine)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
