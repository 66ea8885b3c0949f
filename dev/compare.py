#!/usr/bin/env python3
"""Dev mirror of the driver's t2 correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + oracle_sql.json), then this script replays
each oracle SQL in DuckDB over the same fixture dir and diffs values.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir> [--json summary.json] [query...]

--json writes a machine-readable per-query summary (the shape the round's
CORRECTNESS_SELF artifact commits, so a round is self-evidencing even when
the driver's own correctness artifact comes back empty).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df):
    # driver-style: sort columns by name, then row-sort for order-insensitivity
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    if len(sys.argv) < 3:
        sys.exit("usage: compare.py <sfDir> <verifyOutDir> [--json summary.json] [query...]")
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        if i + 1 >= len(rest):
            sys.exit("usage: --json needs a file argument")
        json_out = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = n_rowsonly = 0
    statuses = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(d + "/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); n_bad += 1; statuses[name] = "no_output"; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        if name not in oracle:
            print(f"{name}: rows-only ({len(got)} rows)"); n_rowsonly += 1
            statuses[name] = "rows_only" if len(got) else "rows_only_EMPTY"
            if len(got) == 0: print(f"  !! EMPTY")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_bad += 1; statuses[name] = "oracle_error"; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name}: COLUMN MISMATCH got={list(g.columns)} exp={list(e.columns)}")
            n_bad += 1; statuses[name] = "column_mismatch"; continue
        if len(g) != len(e):
            print(f"{name}: ROWCOUNT got={len(g)} exp={len(e)}"); n_bad += 1; statuses[name] = "rowcount_mismatch"; continue
        diffs = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                same = (a.astype(str).values == b.astype(str).values)
            except Exception:
                same = a.values == b.values
            bad = (~same).sum()
            if bad: diffs.append((c, int(bad)))
        if diffs:
            print(f"{name}: VALUE DIFFS {diffs} of {len(g)} rows")
            for c, _ in diffs[:2]:
                mask = g[c].astype(str).values != e[c].astype(str).values
                print("   got:", g[mask].head(3).to_dict("records"))
                print("   exp:", e[mask].head(3).to_dict("records"))
            n_bad += 1
            statuses[name] = "value_diff"
        else:
            print(f"{name}: OK ({len(g)} rows, {len(g.columns)} cols)")
            n_ok += 1
            statuses[name] = "ok"
    # a partially-failed Verify run dumps FEWER query dirs than the oracle
    # expects; without this check the summary still looks green (only the
    # nqueries count betrays it) — count every missing dump as bad
    if not only:
        for name in sorted(set(oracle) - set(statuses)):
            print(f"{name}: MISSING DUMP (oracle present, no output dir)")
            n_bad += 1
            statuses[name] = "missing_dump"
    print(f"\n== {n_ok} ok, {n_bad} bad, {n_rowsonly} rows-only ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"ok": n_ok, "bad": n_bad, "rows_only": n_rowsonly,
                       "nqueries": len(statuses), "sf_dir": sf_dir,
                       "queries": statuses}, f, indent=0, sort_keys=True)
            f.write("\n")
    sys.exit(1 if n_bad else 0)

main()
