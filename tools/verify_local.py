#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [timeoutSec]

The optional per-oracle timeout (seconds) makes cross-SF sweeps safe:
at sf0.1 every oracle finishes under 150 s today, but a regression in
a heavy CTE could otherwise wedge DuckDB for hours. Timed-out
oracles report SKIP, not FAIL.

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with views over
the sfDir tables, and compares row count, column names and values.
Dev-only tooling (driver-side python), not part of the Scala library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def split_ctes(sql):
    """Split a single-statement 'WITH a AS (...), b AS (...) SELECT …'
    into ([(name, body), …], final_select). Top-level split only; the
    scanner is quote-aware so parens inside string literals don't
    break the depth count. Returns None for WITH RECURSIVE (a
    recursive CTE can't be materialized as a plain temp table)."""
    s = sql.strip()
    if not s.upper().startswith("WITH"):
        return None
    i = 4
    if s.upper()[:14] == "WITH RECURSIVE":
        return None
    ctes = []
    while True:
        while s[i].isspace():
            i += 1
        j = i
        while s[j].isalnum() or s[j] == "_":
            j += 1
        name = s[i:j]
        i = j
        while s[i].isspace():
            i += 1
        assert s[i:i + 2].upper() == "AS", f"expected AS at {i}: {s[i:i+20]}"
        i += 2
        while s[i].isspace():
            i += 1
        assert s[i] == "(", f"expected ( at {i}"
        depth, j, quoted = 0, i, False
        while True:
            c = s[j]
            if quoted:
                if c == "'":
                    quoted = False
            elif c == "'":
                quoted = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        ctes.append((name, s[i + 1:j]))
        i = j + 1
        while s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


def run_flat(con, sql, timeout):
    """Re-run one oracle with every top-level CTE materialized as a
    TEMP TABLE in order (earlier tables dropped only at the end —
    later CTEs and the final SELECT may reference any of them). This
    bounds peak memory to one CTE's working set instead of the whole
    pipelined tree, which is what lets the deep unrolled-fixpoint
    graph oracles (q124/q201/q212) complete at sf1 where the
    single-statement form exhausts RAM/spill. Semantics are identical
    by construction: same SQL text per CTE, same final SELECT."""
    parts = split_ctes(sql)
    if parts is None:
        return None, "unflattenable"
    ctes, final = parts
    made = []
    try:
        for name, body in ctes:
            df, to = run_with_timeout(
                con, f"CREATE TEMP TABLE {name} AS {body}", timeout)
            if to == "timeout":
                return None, "timeout"
            made.append(name)
        return run_with_timeout(con, final, timeout)
    finally:
        for name in reversed(made):
            con.execute(f'DROP TABLE IF EXISTS "{name}"')


def run_with_timeout(con, sql, timeout):
    """Run one oracle query, interrupting it after `timeout` seconds
    (None = no limit). Lets the sweep cover larger SFs where a heavy
    oracle could otherwise wedge DuckDB for hours."""
    if timeout is None:
        return con.execute(sql).fetchdf(), None
    import threading
    out, err = [], []
    def work():
        try:
            out.append(con.execute(sql).fetchdf())
        except Exception as e:
            err.append(e)
    t = threading.Thread(target=work)
    t.start()
    t.join(timeout)
    if t.is_alive():
        con.interrupt()
        t.join()
        return None, "timeout"
    if err:
        raise err[0]
    return out[0], None


def main(sf_dir, out_dir, timeout=None):
    con = duckdb.connect()
    import os
    # out-of-core: heavy graph oracles (recursive closure, unrolled
    # fixpoints) exceed RAM at sf1 without a spill directory
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written
        # scale-up data (tools.ScaleUp) ships directory tables
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        flat = ""
        try:
            exp, to = run_with_timeout(con, sql, timeout)
            if to == "timeout" or exp is None:
                raise MemoryError("oracle timeout")
        except Exception as e:
            oom = isinstance(e, MemoryError) or "Out of Memory" in str(e)
            if not oom:
                print(f"FAIL {name}: oracle SQL error: {e}")
                failures += 1
                continue
            # resource exhaustion in the pipelined form: retry with
            # every top-level CTE materialized as a temp table, which
            # bounds peak memory per step (the deep unrolled graph
            # CTEs at sf1). Identical SQL per step ⇒ same semantics.
            try:
                exp, to = run_flat(con, sql, timeout)
            except Exception as e2:
                exp, to = None, str(e2)
            if exp is None:
                print(f"SKIP {name}: oracle exhausted DuckDB resources "
                      f"(flat retry: {to})")
                continue
            flat = " [flat]"
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} "
                  f"got={list(got.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failures += 1
            continue
        bad = 0
        first = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                a, b = norm(a), norm(b)
                if a is None and b is None:
                    continue
                eq = (a == b)
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (a != a and b != b)
                if not eq:
                    try:  # pandas NaT/None mismatch tolerance for pd.isna pairs
                        import pandas as pd
                        if pd.isna(a) and pd.isna(b):
                            eq = True
                    except Exception:
                        pass
                if not eq:
                    bad += 1
                    if first is None:
                        first = (c, i, a, b)
        if bad:
            c, i, a, b = first
            print(f"FAIL {name}: {bad} value mismatches; first col={c} "
                  f"row={i} exp={a!r} got={b!r}")
            failures += 1
        else:
            print(f"PASS {name}: {len(exp)} rows, {len(exp.columns)} cols"
                  f"{flat}")
    # queries without oracle: rows-only
    import os
    declared = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in declared:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {d}: {n} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    to = float(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], to))
