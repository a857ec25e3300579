#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev harness only —
the Spark library has no Python dependency). Usage:

    python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the result parquet, run the
oracle SQL in DuckDB against the same sfDir tables, sort columns by
name, sort rows, and hash-compare values.
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return "\x1e".join(out)

def main(sf_dir, out_dir, partial=False):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    failures = 0
    # a query whose Verify dump is MISSING (it threw during the dump)
    # must fail the gate, not silently skip the compare — otherwise a
    # regression that breaks a query still exits 0. --partial tolerates
    # it for single-query dev iteration (Verify's filter arg).
    dumped = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
              if os.path.isdir(d)}
    for q in sorted(set(oracle) - dumped):
        if partial:
            print(f"[skipped] {q}: no dump (partial mode)")
        else:
            failures += 1
            print(f"[FAIL] {q}: oracle present but no Verify dump — query threw?")
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        q = os.path.basename(qdir)
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        if q not in oracle:
            print(f"[rows-only] {q}: {len(grows)} rows")
            continue
        exp = con.sql(oracle[q])
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
        ok_schema = sorted(gcols) == sorted(ecols)
        ok_rows = len(grows) == len(erows)
        ok_hash = ok_schema and ok_rows and canon(grows, gcols) == canon(erows, ecols)
        # dtype channel meta-check: the driver's comparator goes through
        # duckdb->pandas on BOTH sides; a windowed sum(BIGINT) silently
        # becomes HUGEINT->float64 while Spark's parquet stays int64, so
        # identical VALUES hash-differently (repr(1.0) vs str(1)). Assert
        # the pandas dtype of every oracle column equals the Spark
        # result's — this catches the whole class even when today's
        # values happen to stringify identically.
        # (Deliberate 2x: the .df() re-executes each side. The pandas
        # dtype depends on NULL PRESENCE in the result (nullable BIGINT
        # -> float64 only when a null actually appears), so neither a
        # LIMIT-0 probe nor the DBAPI description can stand in for the
        # full execution, and deriving canon rows from the DataFrame
        # would change the value channel fetchall has matched the
        # driver on. Gate integrity is worth the wall time.
        # Int WIDTH never matters (str(1) is '1' for int8..int64 alike);
        # float32 vs float64 does (fetchall widens f32 with different
        # digits), so only integer kinds collapse.
        def dkind(t):
            t = str(t)
            return "int" if t.lstrip("uU").startswith(("int", "Int")) else t
        gtypes = {c: dkind(t) for c, t in
                  con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df().dtypes.items()}
        etypes = {c: dkind(t) for c, t in con.sql(oracle[q]).df().dtypes.items()}
        ok_dtype = gtypes == etypes
        status = "OK" if ok_hash and ok_dtype else "FAIL"
        if ok_hash and not ok_dtype:
            failures += 1
            diff = {c: (gtypes.get(c), etypes.get(c))
                    for c in set(gtypes) | set(etypes)
                    if gtypes.get(c) != etypes.get(c)}
            print(f"[FAIL] {q}: dtype mismatch (spark vs oracle): {diff}")
        elif not ok_hash:
            failures += 1
            print(f"[{status}] {q}: schema={ok_schema} ({sorted(gcols)} vs {sorted(ecols)}) rows={len(grows)}/{len(erows)}")
            if not ok_dtype:
                diff = {c: (gtypes.get(c), etypes.get(c))
                        for c in set(gtypes) | set(etypes)
                        if gtypes.get(c) != etypes.get(c)}
                print(f"  dtype diff (spark vs oracle): {diff}")
            if ok_schema and ok_rows:
                # show first differing row pair
                g = sorted(canon(grows, gcols).split("\x1e"))
                e = sorted(canon(erows, ecols).split("\x1e"))
                for a, b in zip(g, e):
                    if a != b:
                        print("  got:", a[:300])
                        print("  exp:", b[:300])
                        break
        else:
            print(f"[OK] {q}: {len(grows)} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], partial="--partial" in sys.argv[3:])
