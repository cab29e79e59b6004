#!/usr/bin/env python3
"""Time the DuckDB oracle side of the headline queries — the absolute
yardstick VERDICT r6 asked for (BENCH.md gains a duckdb column).

Usage: python3 scripts/duckbench.py <sfDir> <oracle_sql.json> [out.json]

Runs each headline query's oracle SQL in DuckDB over views on the same
parquet tables Spark reads, min-of-3, and prints one JSON object
{name: seconds}. Single-threaded-engine caveats apply: DuckDB is an
embedded OLAP executor with no scheduling overhead, so it should WIN the
small queries — the point is a stable absolute baseline, not a race.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# headline set: TPC-H shapes + the dedup chain + text/sketch flagships
HEADLINE = [
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7",
    "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q12", "q_tpch_q13",
    "q_tpch_q14", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q22",
    "q_groupby_agg", "q_events_hourly", "q_dedup_exact", "q_dedup_ngram",
    "q_dedup_minhash", "q_dedup_verified", "q_dedup_components",
    "q_dedup_apply", "q_dedup_e2e", "q_dedup_cc_minhash", "q_containment",
    "q_topk_freq", "q_sessionize",
    # round 9: the new TPC-H shapes + pipeline operators
    "q_tpch_q2", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20", "q_tpch_q21",
    "q_line_dedup", "q_gopher_rules", "q_token_budget",
]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.loads(Path(oracle_path).read_text())
    import threading

    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    cap = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
    times = {}
    for name in HEADLINE:
        sql = oracle.get(name)
        if sql is None:
            continue
        samples = []
        capped = False
        for _ in range(3):
            # fresh connection per sample: a Timer that fires in the gap
            # between query completion and cancel() would leave a stale
            # interrupt flag that aborts the NEXT query on a shared
            # connection, mis-recording a healthy query as capped
            con = fresh_con()
            timer = threading.Timer(cap, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            except Exception:
                # only a long-running abort is the cap; an instant error is
                # a broken oracle (binder error, typo) and must SURFACE,
                # not masquerade as a 120 s lower bound
                if time.perf_counter() - t0 >= cap * 0.9:
                    capped = True
                else:
                    raise
            finally:
                timer.cancel()
                con.close()
            # adaptive: one sample is plenty once a query is in the tens of
            # seconds (noise is a fraction of a percent there; min-of-3 is
            # for sub-second scheduling jitter)
            if capped or samples[-1] > 5.0:
                break
        # a capped query records the cap as a LOWER bound marker (negative)
        times[name] = round(min(samples), 3) if samples else -cap
        print(name, times[name], flush=True)
        if out_path:
            Path(out_path).write_text(json.dumps(times))
    print(json.dumps(times))


if __name__ == "__main__":
    main()
