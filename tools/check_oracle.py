#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
first (writes <out>/<name>/ parquet + <out>/oracle_sql.json), then this
script replays each oracle SQL in DuckDB over the sf tables and compares
row sets (columns sorted by name, rows sorted, exact values).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: cannot read engine output: {e}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql)
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns differ engine={sorted(gcols)} oracle={sorted(wcols)}")
            n_bad += 1
            continue
        # type-alignment check: the driver hashes the TYPED serialization,
        # so e.g. Spark DECIMAL(28,4) vs DuckDB DECIMAL(38,4) is a FAIL
        # even when values match (round-1 lesson).
        gt = {r[0]: r[1] for r in
              con.execute(f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()}
        wt = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        mismatch = {c: (gt[c], wt[c]) for c in gt if gt[c] != wt.get(c)}
        if mismatch:
            print(f"FAIL {name}: result types differ {mismatch}")
            n_bad += 1
            continue
        g, w = canon(grows, gcols), canon(wrows, wcols)
        if g == w:
            print(f"ok   {name}: {len(g)} rows")
            n_ok += 1
        else:
            print(f"FAIL {name}: rows differ (engine {len(g)} vs oracle {len(w)})")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at row {i}:\n   engine: {a}\n   oracle: {b}")
                    break
            else:
                which = "engine" if len(g) > len(w) else "oracle"
                extra = (g if len(g) > len(w) else w)[min(len(g), len(w))]
                print(f"  extra {which} row: {extra}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
