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
import glob
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(t):
    """Collapse an arrow type to the class the driver's hasher sees.

    The driver stringifies pandas cells before hashing, so two results
    only hash equal when each column lands in the same pandas dtype
    family. HUGEINT sums arrive as decimal128 (pandas Decimal — repr
    differs from int), and list cells kill the row sorter outright.
    """
    if pa.types.is_decimal(t):
        return "decimal"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t)
            or pa.types.is_map(t)):
        return "nested"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    return str(t)


def type_parity(name, spark_dir, oracle_schema):
    """Fail any oracle whose arrow result types the driver hashes
    differently from the Spark parquet result (decimal/list columns, or
    int/float width drift). Returns a list of problem strings."""
    parts = sorted(glob.glob(os.path.join(spark_dir, "*.parquet")))
    if not parts:
        return [f"no parquet part files under {spark_dir}"]
    spark_schema = pq.read_schema(parts[0])
    probs = []
    want = {f.name: type_class(f.type) for f in oracle_schema}
    got = {f.name: type_class(f.type) for f in spark_schema}
    for col in sorted(set(want) | set(got)):
        w, g = want.get(col), got.get(col)
        for side, cls in (("oracle", w), ("spark", g)):
            if cls in ("decimal", "nested"):
                probs.append(f"{col}: {side} result is {cls}-typed "
                             f"(driver hasher can't digest it)")
        if w is not None and g is not None and w != g \
                and "decimal" not in (w, g) and "nested" not in (w, g):
            probs.append(f"{col}: spark={g} vs oracle={w}")
    return probs


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
    # optional trailing names restrict the check to that subset (used by
    # verify_shake.py's targeted runs, whose out dir holds only those
    # queries while oracle_sql.json still declares every oracle)
    subset = set(sys.argv[3:])
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
    # A declared oracle whose result dir is MISSING means graft.Verify
    # caught an exception for that query (it logs and continues) — the
    # driver's compare would report it as a hard red. Silently skipping
    # it here hid a whole class of failures; fail loudly instead.
    present = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(oracles):
        if name not in present and (not subset or name in subset):
            print(f"  ✗ {name}: NO RESULT (query failed in graft.Verify)")
            n_fail += 1
            failed.append(name)
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (subset and name not in subset):
            continue
        res = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = [c[0] for c in res.description]
        got = res.fetchall()
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(got)} rows)")
            continue
        # A broken oracle (missing function, syntax error, ...) must
        # fail THIS query and continue — an uncaught exception here
        # aborts the gate and hides every alphabetically-later query
        # (round-11 postmortem: the sha1-less DuckDB crashed the run).
        try:
            otab = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE-ERROR {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            n_fail += 1
            failed.append(name)
            continue
        want_cols = otab.schema.names
        want = [tuple(r[c] for c in want_cols) for r in otab.to_pylist()]
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        tprobs = type_parity(name, d, otab.schema)
        if tprobs:
            print(f"  ✗ {name}: TYPE-PARITY")
            for p in tprobs:
                print(f"      {p}")
            n_fail += 1; failed.append(name)
        elif gc != wc:
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
