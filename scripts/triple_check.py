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
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    # entries may be "duckdb_expr AS name" — DuckDB evaluates the
    # expression during the load, SQLite stores the aliased column
    "events": ["epoch_ms(ts) AS ms", "event_type", "value"],
    "documents": ["doc_id", "lang", "n_chars"],
}

# SQLite-dialect twins of NON-portable DuckDB oracles (same output column
# names as the gate entry). Portable oracles are sqlite_spotcheck.py's job.
QUERIES = {
    # calibrationFit's binning + weighted-logit-OLS algebra on the
    # closed-form probability gate (q_calibration_heur): SQLite has no
    # DECIMAL, so the dec6 terms ride as doubles — tolerance compare
    "q_calibration_heur": """
        WITH pp AS (SELECT (n_chars * 1000000) / (n_chars + 300) AS ppm,
                      (CASE WHEN (n_chars > 310) <> (doc_id % 13 = 0)
                            THEN 1 ELSE 0 END) AS y
                    FROM documents),
        bb AS (SELECT min((ppm * 10) / 1000000, 9) AS bin,
                 count(*) AS n, sum(y) AS pos, sum(ppm) AS conf_ppm
               FROM pp GROUP BY 1),
        us AS (SELECT n, pos, conf_ppm,
                 ln(CAST(conf_ppm AS REAL) /
                    CAST(1000000 * n - conf_ppm AS REAL)) AS xr,
                 ln(CAST(pos AS REAL) / CAST(n - pos AS REAL)) AS yr
               FROM bb
               WHERE pos > 0 AND pos < n
                 AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        tm AS (SELECT n, round(xr, 6) AS x, round(yr, 6) AS y,
                 round(xr * xr, 6) AS xx, round(xr * yr, 6) AS xy
               FROM us),
        a AS (SELECT count(*) AS n_bins,
                coalesce(sum(n), 0) AS n_rows,
                CAST(coalesce(sum(n), 0) AS REAL) AS wv,
                sum(n * x) AS sx, sum(n * y) AS sy,
                sum(n * xx) AS sxx, sum(n * xy) AS sxy
              FROM tm)
        SELECT n_bins, n_rows,
          CASE WHEN wv * sxx - sx * sx > 0.0 THEN
            round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
          END AS slope,
          CASE WHEN wv * sxx - sx * sx > 0.0 THEN
            round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
              / wv, 6)
          END AS intercept
        FROM a""",

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
    # round-13 twins — the seasonal split, its strength scalar, and the
    # Gini jackknife (windows + sqrt; floats under the tolerance compare,
    # where the gate's DECIMAL conventions have no SQLite counterpart)
    "q_seasonal_dow": """
        WITH bd AS (SELECT ms/86400000 AS day,
            CAST(sum(CAST(round(value*100) AS INTEGER)) AS INTEGER) AS day_cents
          FROM events WHERE event_type='purchase' GROUP BY 1),
        bw AS (SELECT day % 7 AS dow,
            round(CAST(sum(day_cents) AS REAL)/count(*), 6) AS dow_mean
          FROM bd GROUP BY 1)
        SELECT day, day % 7 AS dow, day_cents, dow_mean,
          round(day_cents - dow_mean, 6) AS resid
        FROM bd JOIN bw ON bd.day % 7 = bw.dow ORDER BY day""",
    "q_seasonal_strength": """
        WITH daily AS (SELECT event_type, ms/86400000 AS day,
            count(*) AS c FROM events GROUP BY 1, 2),
        d2 AS (SELECT event_type, day % 7 AS dow, c FROM daily),
        tm AS (SELECT event_type,
            round(CAST(sum(c) AS REAL)/count(*), 6) AS m,
            count(*) AS n_days FROM d2 GROUP BY 1),
        dm AS (SELECT event_type, dow,
            round(CAST(sum(c) AS REAL)/count(*), 6) AS mdow
          FROM d2 GROUP BY 1, 2),
        j AS (SELECT d2.event_type, c, m, mdow, n_days
          FROM d2 JOIN dm ON d2.event_type = dm.event_type AND d2.dow = dm.dow
          JOIN tm ON d2.event_type = tm.event_type),
        a AS (SELECT event_type, max(n_days) AS n_days,
          sum(round((c-m)*(c-m), 6)) AS sst,
          sum(round((c-mdow)*(c-mdow), 6)) AS ssr
          FROM j GROUP BY 1)
        SELECT event_type, n_days,
          CASE WHEN sst > 0.0 THEN round(1.0 - ssr/sst, 6) END AS strength
        FROM a ORDER BY 1""",
    "q_gini_jackknife": """
        WITH rev AS (SELECT o_custkey,
            CAST(sum(CAST(round(o_totalprice*100) AS INTEGER)) AS INTEGER) AS x
          FROM orders GROUP BY 1),
        b AS (SELECT o_custkey % 12 AS grp, x AS v FROM rev),
        gv AS (SELECT grp, v, count(*) AS c_gv, v*count(*) AS s_gv
               FROM b GROUP BY 1, 2),
        bv AS (SELECT v, sum(c_gv) AS c, sum(s_gv) AS s FROM gv GROUP BY 1),
        tot AS (SELECT sum(c) AS n_all, sum(s) AS t_all FROM bv),
        pre AS (SELECT v, c, s,
          coalesce(sum(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
          coalesce(sum(s) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sb
          FROM bv),
        preT AS (SELECT v, c, cb, sb, n_all - cb - c AS ca,
          t_all - sb - s AS sa FROM pre CROSS JOIN tot),
        s2 AS (SELECT sum((v*cb - sb + sa - v*ca) * c) AS s2 FROM preT),
        g1 AS (SELECT g.grp, g.v, g.c_gv, g.s_gv,
          coalesce(sum(g.c_gv) OVER (PARTITION BY g.grp ORDER BY g.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbg,
          coalesce(sum(g.s_gv) OVER (PARTITION BY g.grp ORDER BY g.v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sbg,
          sum(g.c_gv) OVER (PARTITION BY g.grp) AS n_g,
          sum(g.s_gv) OVER (PARTITION BY g.grp) AS t_g,
          p.cb, p.sb, p.ca, p.sa
          FROM gv g JOIN preT p ON g.v = p.v),
        per AS (SELECT grp, max(n_g) AS n_g, max(t_g) AS t_g,
          sum((v*cb - sb + sa - v*ca) * c_gv) AS a_g,
          sum((v*cbg - sbg + (t_g - sbg - s_gv)
             - v*(n_g - cbg - c_gv)) * c_gv) AS b_g
          FROM g1 GROUP BY 1),
        aj AS (SELECT grp, round(CAST(s2 - 2*a_g + b_g AS REAL)
            / (2.0*(n_all - n_g)*(t_all - t_g)), 6) AS ginig
          FROM per CROSS JOIN tot CROSS JOIN s2),
        st AS (SELECT count(*) AS ng FROM aj),
        md AS (SELECT round(CAST(sum(ginig) AS REAL)/(SELECT ng FROM st), 6)
               AS adot FROM aj)
        SELECT n_all AS n_rows, t_all AS sum_val,
          round(CAST(s2 AS REAL)/(2.0*n_all*t_all), 6) AS gini,
          (SELECT ng FROM st) AS n_groups,
          round(sqrt(CAST((SELECT ng FROM st)-1 AS REAL)/(SELECT ng FROM st)
            * (SELECT sum(round((ginig-adot)*(ginig-adot), 6))
               FROM aj CROSS JOIN md)), 6) AS jack_se
        FROM tot CROSS JOIN s2""",
    # round-13 cont.: exact Kendall pair counts (pure integers + sqrt)
    "q_kendall": """
        WITH bd AS (SELECT ms/86400000 AS day,
            CAST(sum(CASE WHEN event_type='purchase'
                 THEN CAST(round(value*100) AS INTEGER) ELSE 0 END)
              AS INTEGER) AS x,
            count(*) AS y
          FROM events GROUP BY 1),
        pr AS (SELECT
            sum(CASE WHEN (a.x<b.x AND a.y<b.y) OR (a.x>b.x AND a.y>b.y)
                THEN 1 ELSE 0 END) AS nc,
            sum(CASE WHEN (a.x<b.x AND a.y>b.y) OR (a.x>b.x AND a.y<b.y)
                THEN 1 ELSE 0 END) AS nd,
            sum(CASE WHEN a.x=b.x AND a.y<>b.y THEN 1 ELSE 0 END) AS tx,
            sum(CASE WHEN a.y=b.y AND a.x<>b.x THEN 1 ELSE 0 END) AS ty,
            sum(CASE WHEN a.x=b.x AND a.y=b.y THEN 1 ELSE 0 END) AS txy
          FROM bd a JOIN bd b ON a.day < b.day),
        nn AS (SELECT count(*) AS n_days FROM bd)
        SELECT n_days, nc, nd, tx, ty, txy,
          CASE WHEN nc+nd+ty > 0 AND nc+nd+tx > 0 THEN
            round(CAST(nc-nd AS REAL)/(sqrt(nc+nd+ty)*sqrt(nc+nd+tx)), 6)
          END AS tau_b
        FROM pr CROSS JOIN nn""",
    # exact dyadic EWMA — SQLite's << replays the integer-scaled form
    "q_ewma": """
        WITH bd AS (SELECT ms/86400000 AS day,
            CAST(sum(CAST(round(value*100) AS INTEGER)) AS INTEGER)
              AS day_cents
          FROM events WHERE event_type='purchase' GROUP BY 1),
        w AS (SELECT a.day, a.day_cents,
            sum(b.day_cents * (1 << (19 - (a.day - b.day)))) AS ewma_scaled
          FROM bd a JOIN bd b ON b.day <= a.day AND b.day > a.day - 20
          GROUP BY 1, 2)
        SELECT day, day_cents, ewma_scaled,
          round(CAST(ewma_scaled AS REAL)/1048576.0, 6) AS ewma
        FROM w ORDER BY day""",
    # leave-one-group-out tau-b jackknife — the pair-class cell table and
    # inclusion-exclusion replicated in SQLite (floats under tolerance)
    "q_tau_jackknife": """
        WITH bd AS (SELECT day, x, y, day % 6 AS g FROM (
            SELECT ms/86400000 AS day,
              CAST(sum(CASE WHEN event_type='purchase'
                   THEN CAST(round(value*100) AS INTEGER) ELSE 0 END)
                AS INTEGER) AS x,
              count(*) AS y
            FROM events GROUP BY 1)),
        cls AS (SELECT a.g AS gi, b.g AS gj,
            sum(CASE WHEN (a.x<b.x AND a.y<b.y) OR (a.x>b.x AND a.y>b.y)
                THEN 1 ELSE 0 END) AS nc,
            sum(CASE WHEN (a.x<b.x AND a.y>b.y) OR (a.x>b.x AND a.y<b.y)
                THEN 1 ELSE 0 END) AS nd,
            sum(CASE WHEN a.x=b.x AND a.y<>b.y THEN 1 ELSE 0 END) AS tx,
            sum(CASE WHEN a.y=b.y AND a.x<>b.x THEN 1 ELSE 0 END) AS ty
          FROM bd a JOIN bd b ON a.day < b.day GROUP BY 1, 2),
        tot AS (SELECT sum(nc) AS nc, sum(nd) AS nd,
            sum(tx) AS tx, sum(ty) AS ty FROM cls),
        gs AS (SELECT DISTINCT g FROM bd),
        loo AS (SELECT gs.g, sum(nc) AS nc, sum(nd) AS nd,
            sum(tx) AS tx, sum(ty) AS ty
          FROM gs JOIN cls ON cls.gi <> gs.g AND cls.gj <> gs.g
          GROUP BY 1),
        aj AS (SELECT taug FROM (
            SELECT CASE WHEN nc+nd+ty > 0 AND nc+nd+tx > 0 THEN
              round(CAST(nc-nd AS REAL)/(sqrt(nc+nd+ty)*sqrt(nc+nd+tx)), 6)
            END AS taug FROM loo) q
          WHERE taug IS NOT NULL),
        st AS (SELECT count(*) AS ng,
            round(CAST(sum(taug) AS REAL)/count(*), 6) AS adot FROM aj),
        dev AS (SELECT ng, sum(round((taug-adot)*(taug-adot), 6)) AS ssq
          FROM aj CROSS JOIN st GROUP BY 1),
        nn AS (SELECT count(*) AS n_days FROM bd)
        SELECT n_days, nc, nd,
          CASE WHEN nc+nd+ty > 0 AND nc+nd+tx > 0 THEN
            round(CAST(nc-nd AS REAL)/(sqrt(nc+nd+ty)*sqrt(nc+nd+tx)), 6)
          END AS tau_b,
          ng AS n_groups,
          round(sqrt(CAST(ng-1 AS REAL)/ng*ssq), 6) AS jack_se
        FROM tot CROSS JOIN nn CROSS JOIN dev""",
    # Welch's t — REAL sums of squares under the tolerance compare (the
    # gate's DECIMAL(38,0) moments have no SQLite counterpart)
    "q_welch_t": """
        WITH m AS (SELECT
            sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS na,
            sum(CASE WHEN lang='en' THEN n_chars ELSE 0 END) AS sa,
            sum(CASE WHEN lang='en' THEN CAST(n_chars AS REAL)*n_chars
                ELSE 0 END) AS qa,
            sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS nb,
            sum(CASE WHEN lang='de' THEN n_chars ELSE 0 END) AS sb,
            sum(CASE WHEN lang='de' THEN CAST(n_chars AS REAL)*n_chars
                ELSE 0 END) AS qb
          FROM documents WHERE lang IN ('en','de')),
        e AS (SELECT na, nb,
            CAST(sa AS REAL)/na AS ma, CAST(sb AS REAL)/nb AS mb,
            (qa - CAST(sa AS REAL)*sa/na)/(na-1)/na AS s2a,
            (qb - CAST(sb AS REAL)*sb/nb)/(nb-1)/nb AS s2b
          FROM m)
        SELECT na, nb, round(ma,6) AS mean_a, round(mb,6) AS mean_b,
          round((ma-mb)/sqrt(s2a+s2b),6) AS t_stat,
          round((s2a+s2b)*(s2a+s2b)
            /(s2a*s2a/(na-1)+s2b*s2b/(nb-1)),6) AS df
        FROM e""",
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
    lite.create_function("sqrt", 1, math.sqrt)
    for t, cols in LOADS.items():
        rows = duck.sql(
            f"SELECT {', '.join(cols)} FROM '{sf_dir}/{t}.parquet'").fetchall()
        names = [c.split(" AS ")[-1] for c in cols]
        lite.execute(f"CREATE TABLE {t} ({', '.join(names)})")
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
