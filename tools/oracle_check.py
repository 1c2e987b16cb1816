#!/usr/bin/env python3
"""Local dev mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--strict]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
normalizes both sides (columns sorted by name, rows sorted), and reports
row-count / schema / value equality. Dev tool only — the engine itself is
pure Scala/Spark.

--strict reproduces the driver's exact-hash behavior: stringified values
(including pandas dtype rendering — the DuckDB HUGEINT sum pitfall shows up
as 662.0 vs 662 here), no float tolerance. Round-2 lost 5 queries to diffs
only this mode catches; run it before trusting a green tolerant pass.
"""
import json, math, sys, glob, os
import duckdb

def sort_key(t):
    # floats participate in the sort via a coarse (6 sig-digit) rendering so
    # two values equal within 1e-9 relative tolerance land in the same spot
    # on both sides; exact comparison happens after alignment via isclose.
    return tuple(
        (x is None, str(type(x)), f"{x:.6e}" if isinstance(x, float) else str(x))
        for x in t)

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=sort_key)
    return [c for c in sorted(cols)], out

def strict_check(con, name, files, sql):
    """Driver-fidelity compare: pandas frames, columns sorted by name,
    rows compared as stringified tuples — no tolerance, dtypes included."""
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    exp = con.execute(sql).df()
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    dg = dict(got.dtypes.astype(str))
    de = dict(exp.dtypes.astype(str))
    gs = sorted(map(str, got.itertuples(index=False, name=None)))
    es = sorted(map(str, exp.itertuples(index=False, name=None)))
    errs = []
    if dg != de:
        errs.append("DTYPES " + str({k: (dg.get(k), de.get(k))
                                     for k in set(dg) | set(de)
                                     if dg.get(k) != de.get(k)}))
    if gs != es:
        first = next((f"{a} != {b}" for a, b in zip(gs, es) if a != b),
                     f"row count {len(gs)} vs {len(es)}")
        errs.append("VALUES " + first)
    try:  # the driver sorts with pandas; ndarray cells crash it
        got.sort_values(by=list(got.columns))
    except Exception as e:
        errs.append(f"SORT-CRASH {e}")
    return errs

def main(sf_dir, out_dir, strict=False):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})")
        got_rows, got_cols = got.fetchall(), [c[0] for c in got.description]
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got_rows)} rows "
                  f"{'OK' if len(got_rows) > 0 else 'EMPTY!'}")
            n_noracle += 1
            continue
        if strict:
            errs = strict_check(con, name, files, oracle[name])
            if errs:
                n_fail += 1
                print(f"  [FAIL] {name}: " + "; ".join(errs))
            else:
                n_pass += 1
                print(f"  [pass] {name}: strict-exact")
            continue
        exp = con.execute(oracle[name])
        exp_rows, exp_cols = exp.fetchall(), [c[0] for c in exp.description]
        gc, gr = normalize(got_rows, got_cols)
        ec, er = normalize(exp_rows, exp_cols)
        status = []
        if gc != ec:
            status.append(f"SCHEMA got={gc} exp={ec}")
        if len(gr) != len(er):
            status.append(f"ROWS got={len(gr)} exp={len(er)}")
        elif gc == ec:
            bad = [(a, b) for a, b in zip(gr, er) if a != b]
            # tolerate float noise separately so we can report it distinctly
            really_bad = []
            for a, b in bad:
                ok = len(a) == len(b) and all(
                    (x == y) or (isinstance(x, float) and isinstance(y, float)
                                 and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)))
                    for x, y in zip(a, b))
                if not ok:
                    really_bad.append((a, b))
            if really_bad:
                status.append(f"VALUES {len(really_bad)} diff, first: "
                              f"{really_bad[0][0]} != {really_bad[0][1]}")
            elif bad:
                status.append(f"FLOAT-NOISE {len(bad)} rows (within 1e-9)")
        if status:
            n_fail += 1
            print(f"  [FAIL] {name}: " + "; ".join(status))
        else:
            n_pass += 1
            print(f"  [pass] {name}: {len(gr)} rows exact")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--strict" in sys.argv[3:]))
