#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `graft.Verify` has written outDir/<name>/ parquet dirs and
outDir/oracle_sql.json: executes each oracle in DuckDB against the sf
tables, then compares (columns sorted by name, rows sorted, exact value
equality) and reports per-query PASS/FAIL with diff details.

Type-strict: the driver's hash is computed over DuckDB-typed values, so a
DuckDB HUGEINT oracle column vs a Spark BIGINT parquet column hash-mismatches
even when every value is equal. We therefore compare `DESCRIBE` output of
both sides and fail on ANY type difference (the round-9 failure class).

Usage: check_oracle.py <sfDir> <outDir> [query...]
       check_oracle.py --selftest   # prove the type gate catches HUGEINT
"""
import sys, os, json, glob, math
import duckdb


def duck_types(con, sql):
    """column_name -> DuckDB column_type for an arbitrary SELECT."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def type_mismatches(con, parquet_sql, oracle_sql):
    """List of (col, spark_type, oracle_type) diffs on shared columns."""
    gt, et = duck_types(con, parquet_sql), duck_types(con, oracle_sql)
    return [(c, gt[c], et[c]) for c in sorted(set(gt) & set(et))
            if gt[c] != et[c]]


def selftest():
    """A HUGEINT-vs-BIGINT fixture MUST be flagged; a matching pair must not."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/t.parquet"
        con.execute(f"COPY (SELECT CAST(42 AS BIGINT) AS x) TO '{p}'")
        bad = type_mismatches(con, f"SELECT * FROM read_parquet('{p}')",
                              "SELECT sum(CAST(42 AS BIGINT)) AS x")  # sum(BIGINT)->HUGEINT
        ok = type_mismatches(con, f"SELECT * FROM read_parquet('{p}')",
                             "SELECT CAST(sum(CAST(42 AS BIGINT)) AS BIGINT) AS x")
    assert bad == [("x", "BIGINT", "HUGEINT")], f"gate missed widening: {bad}"
    assert ok == [], f"false positive: {ok}"
    print("selftest PASS: HUGEINT widening is caught, exact match is clean")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        if name not in oracles:
            ok = len(got) > 0
            print(f"[{'ROWS' if ok else 'FAIL'}] {name}: rows-only, {len(got)} rows")
            n_rowsonly += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"[FAIL] {name}: column mismatch spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        tdiff = type_mismatches(
            con, f"SELECT * FROM read_parquet({files!r})", f"({oracles[name]})")
        if tdiff:
            print(f"[FAIL] {name}: TYPE mismatch (driver hash is type-sensitive):")
            for c, gt, et in tdiff:
                print(f"    {c}: spark={gt} oracle={et}")
            n_fail += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ecols].itertuples(index=False)]
        g.sort(key=repr)
        e.sort(key=repr)
        if len(g) != len(e):
            print(f"[FAIL] {name}: row count spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"[FAIL] {name}: {len(bad)}/{len(g)} rows differ; first 3:")
            for a, b in bad[:3]:
                print(f"    spark={a}\n    duckdb={b}")
            # float near-miss diagnosis
            mx = 0.0
            for a, b in bad:
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        mx = max(mx, abs(x - y))
            if mx:
                print(f"    max float abs diff: {mx:g}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
