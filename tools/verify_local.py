#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB against the sf parquet
tables, and compares: columns sorted by name, rows sorted, values
compared exactly.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # an unbounded memory_limit lets wide expression trees over-commit
    # per-thread intermediates until hard malloc failure; a modest cap
    # makes DuckDB spill/stream instead (observed on the 64-dim ANN
    # oracles at sf0.1)
    con.execute("SET memory_limit='16GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    failed = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        res = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = [c[0] for c in res.description]
        got = res.fetchall()
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            continue
        ores = con.execute(oracles[name])
        want_cols = [c[0] for c in ores.description]
        want = ores.fetchall()
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            print(f"  ✗ {name}: SCHEMA got={gc} want={wc}")
            n_fail += 1; failed.append(name)
        elif g != w:
            n_fail += 1; failed.append(name)
            print(f"  ✗ {name}: VALUES ({len(g)} vs {len(w)} rows)")
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            for a, b in diff:
                print(f"      got  {a}\n      want {b}")
            if len(g) != len(w):
                only_g = set(g) - set(w)
                only_w = set(w) - set(g)
                for x in list(only_g)[:3]: print(f"      extra {x}")
                for x in list(only_w)[:3]: print(f"      missing {x}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(g)} rows)")
    print(f"PASS {n_pass} FAIL {n_fail}" + (f" -> {failed}" if failed else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
