#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the engine's parquet result,
run the oracle SQL in DuckDB over the sf dir's parquet tables, sort both
by all columns (column order = sorted names), and compare values. Floats
compare with rel/abs tolerance 1e-9 as a backstop (both sides already
round to 6 decimals). Exit nonzero on any mismatch.

This is builder-side tooling only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return (
        [cols[i] for i in idx],
        [str(types[i]) for i in idx],
        sorted(out, key=lambda t: tuple(map(lambda v: (v is None, str(type(v)), v), t))),
    )


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-9 + 1e-9 * max(abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])  # optional: subset of query names to check
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, gtypes, grows = got_rel.columns, got_rel.types, got_rel.fetchall()
            want_rel = con.sql(sql)
            wcols, wtypes, wrows = want_rel.columns, want_rel.types, want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            results[name] = "error"
            fails += 1
            continue
        gc, gt, gr = canon(grows, gcols, gtypes)
        wc, wt, wr = canon(wrows, wcols, wtypes)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            results[name] = "schema"
            fails += 1
            continue
        # Type-strict: the driver's hash is format-sensitive, so an oracle
        # column whose DuckDB type differs from the Spark result's parquet
        # type (e.g. HUGEINT from sum(BIGINT), or DECIMAL) reds in the driver
        # even when every value coerces equal. Fail it here first.
        if gt != wt:
            diffs = [f"{c}: spark={a} oracle={b}" for c, a, b in zip(gc, gt, wt) if a != b]
            print(f"FAIL {name}: types differ — {'; '.join(diffs)}")
            results[name] = "type"
            fails += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            results[name] = "rows"
            fails += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, wr)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got  {bad[1]}\n  want {bad[2]}")
            results[name] = "hash"
            fails += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
            results[name] = "ok"
    n = len(oracle)
    print(f"\n{n - fails}/{n} queries green")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
