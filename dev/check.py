#!/usr/bin/env python3
"""Local pre-driver oracle harness (SURVEY.md §5.2).

Usage: python3 dev/check.py [sfDir] [verifyOutDir]
Reads oracle_sql.json written by graft.Verify, registers DuckDB views over
the bare table names, runs each oracle, and compares values against the
Spark parquet output with columns sorted by name (mimicking the driver's
order- and value-sensitive hash compare).
Dev-only: python/duckdb never ship in the library itself.
"""
import duckdb, json, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok, bad = [], []
skipped = 0
for name, sql in oracle.items():
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        # subset runs (SPARK_GRAFT_ONLY) dump only the selected queries;
        # a query that wasn't dumped at all is a skip, not a failure —
        # Verify itself prints "[verify] <name> failed:" when a SELECTED
        # query errors, and that still shows up as a missing dir IF the
        # dir was expected: pass --strict to treat every miss as FAIL.
        if "--strict" in sys.argv:
            bad.append(name); print(f"FAIL {name}: no spark output dir")
        else:
            skipped += 1
        continue
    # read the WHOLE part-file list (sorted, so Spark's part-00000.. output
    # order is preserved for the ordered row compare). Inspecting only
    # files[0] let a type/encoding divergence in a later part file pass
    # locally while the driver's representation hash failed (ADVICE r7).
    flist = "[" + ", ".join(f"'{f}'" for f in files) + "]"
    try:
        d = con.execute(sql)
        dcols = [c[0] for c in d.description]
        drows = d.fetchall()
    except Exception as e:
        bad.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
    # strict representation gate: the driver hashes the physical decimal
    # encoding, which Spark (INT64-backed) and DuckDB (INT128-backed) write
    # differently even when values match — round 1 lost 9 green queries to
    # this. Any DECIMAL-typed column in the Spark output is therefore a
    # local FAIL before values are even compared.
    dec_cols = [(r[0], r[1]) for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({flist})").fetchall()
        if "DECIMAL" in r[1].upper()]
    if dec_cols:
        bad.append(name)
        print(f"FAIL {name}: DECIMAL output columns (driver hash hazard): {dec_cols}")
        continue
    s = con.execute(f"SELECT * FROM read_parquet({flist})")
    scols = [c[0] for c in s.description]
    srows = s.fetchall()
    if sorted(dcols) != sorted(scols):
        bad.append(name)
        print(f"FAIL {name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
        continue
    # strict column-type parity at DESCRIBE level (exact DuckDB logical
    # types). DBAPI cursor description collapses type families — BIGINT and
    # HUGEINT are both NUMBER — which let a HUGEINT-typed oracle column
    # (uncast SUM → INT128) sail through locally while the driver's
    # representation-sensitive hash failed (round-6 q151). DESCRIBE gives
    # the exact logical type on both sides.
    dtypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    stypes = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({flist})").fetchall()}
    tdiff = {c: (stypes[c], dtypes[c]) for c in dcols if stypes[c] != dtypes[c]}
    if tdiff:
        bad.append(name)
        print(f"FAIL {name}: column types differ (spark, duck): {tdiff}")
        continue
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    srt = [tuple(r[i] for i in sidx) for r in srows]
    drt = [tuple(r[i] for i in didx) for r in drows]
    if len(srt) != len(drt):
        bad.append(name); print(f"FAIL {name}: rowcount spark={len(srt)} duck={len(drt)}"); continue
    mismatch = None
    for i, (a, b) in enumerate(zip(srt, drt)):
        if a != b:
            mismatch = (i, a, b); break
    if mismatch:
        bad.append(name)
        i, a, b = mismatch
        print(f"FAIL {name}: row {i} differs\n  spark={a}\n  duck ={b}")
        # show the types too — decimals-vs-float etc.
        print(f"  types spark={[type(x).__name__ for x in a]}")
        print(f"  types duck ={[type(x).__name__ for x in b]}")
    else:
        ok.append(name); print(f"ok   {name} ({len(srt)} rows)")

skip_note = f", {skipped} not dumped (subset run)" if skipped else ""
print(f"\n{len(ok)} ok, {len(bad)} fail of {len(oracle)}{skip_note}")
sys.exit(1 if bad else 0)
