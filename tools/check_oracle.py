#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
same parquet tables, sorts columns by name, and compares row-by-row.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    oracled_ok = {}  # name -> bool, for the TWINS.json certification pass
    for name in sorted(oracles):
        sql = oracles[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written")
            n_fail += 1; oracled_ok[name] = False; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1; oracled_ok[name] = False; continue
        sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}")
            n_fail += 1; oracled_ok[name] = False; continue
        a, b = spark_df[sc], oracle_df[oc]
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs oracle {len(b)}")
            n_fail += 1; oracled_ok[name] = False; continue
        # dtype-KIND parity: the driver's hash is value-repr-sensitive —
        # int32(5) and int64(5) both hash as 5, but a float64/object
        # column hashes 69.0 where an integer column hashes 69 (the
        # x170 r6/r7 failure mode: DuckDB HUGEINT surfacing where Spark
        # wrote BIGINT). Fail on numpy KIND mismatches (i/u vs f vs O
        # vs b), ignore width-only differences.
        def kind(s):
            k = getattr(s.dtype, "kind", "O")
            return "i" if k in ("i", "u") else k
        dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in sc
              if kind(a[c]) != kind(b[c])]
        if dt:
            print(f"FAIL {name}: dtype-kind mismatch {dt}")
            n_fail += 1; oracled_ok[name] = False; continue
        def norm(v):
            if hasattr(v, "tolist"): v = v.tolist()
            if isinstance(v, list): return tuple(norm(x) for x in v)
            return v
        bad = None
        for c in sc:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                x, y = norm(x), norm(y)
                if x != y and not (x != x and y != y):  # NaN==NaN ok
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1; oracled_ok[name] = False
        else:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
            oracled_ok[name] = True
    # queries with no oracle: rows-only check + TWINS.json certification
    # (every rows-only row must map to oracled certifiers that PASSed
    # this run, or be explicitly declared none_by_nature with a reason)
    twins_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TWINS.json")
    twins = {}
    if os.path.exists(twins_path):
        with open(twins_path) as f:
            twins = json.load(f).get("rows_only", {})
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name in oracles: continue
        files = sorted(glob.glob(f"{p}/*.parquet"))
        if not files:
            print(f"FAIL {name}: (rows-only) no parquet"); n_fail += 1; continue
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        if n <= 0:
            print(f"FAIL {name}: (rows-only) 0 rows"); n_fail += 1; continue
        ent = twins.get(name)
        if ent is None:
            print(f"FAIL {name}: (rows-only) {n} rows but NOT in TWINS.json — "
                  "declare its oracled certifier(s) or none_by_nature")
            n_fail += 1; continue
        certs = ent.get("certifiers", [])
        if not certs and ent.get("kind") != "none_by_nature":
            print(f"FAIL {name}: (rows-only) empty certifiers without none_by_nature")
            n_fail += 1; continue
        bad_cert = [c for c in certs if not oracled_ok.get(c, False)]
        if bad_cert:
            print(f"FAIL {name}: (rows-only) certifier(s) not green this run: {bad_cert}")
            n_fail += 1; continue
        tag = ("certified by " + "+".join(certs)) if certs else "none_by_nature"
        print(f"PASS {name}: (rows-only) {n} rows, {tag}")
        n_pass += 1
    stale = [t for t in twins if not os.path.isdir(os.path.join(out_dir, t))]
    if stale:
        print(f"FAIL twins-map: entries with no matching query result: {stale}")
        n_fail += 1
    # A rows-only map entry for a query that later GAINED an oracle is
    # also stale (the r11 ADVICE finding): the rows-only loop skips
    # oracled names, so without this check the certification map rots
    # silently — delete the mapping once the query is oracled.
    now_oracled = [t for t in twins if t in oracles]
    if now_oracled:
        print("FAIL twins-map: entries for queries that now HAVE an oracle "
              f"(delete the mapping): {now_oracled}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
