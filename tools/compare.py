# Local stand-in for the driver's correctness gate (builder tooling only —
# the Scala library never depends on this). Replays oracle_sql.json in DuckDB
# over the sfDir tables and diffs against Verify's parquet dumps, with the
# driver's semantics: columns sorted by name, rows sorted, values compared.
#
# Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [q1,q2,...]
import duckdb, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm(r[i]) for i in order) for r in cur.fetchall())
    return [cols[i] for i in order], data

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            ocols, orows = rows_of(con, oracle[name])
            scols, srows = rows_of(duckdb.connect(),
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            if scols != ocols:
                print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
                fails += 1
            elif srows != orows:
                print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
                for a, b in list(zip(srows, orows))[:5]:
                    if a != b:
                        print(f"   spark={a}\n  oracle={b}")
                fails += 1
            else:
                print(f"ok   {name} ({len(srows)} rows)")
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fails += 1
    sys.exit(1 if fails else 0)

main()
