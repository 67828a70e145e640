#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

For each <name>/ parquet dir in verify_out and each oracle in
oracle_sql.json: run the SQL in DuckDB against the sf tables, and compare to
the Spark-written parquet (columns sorted by name, rows sorted, exact value
compare). Prints PASS/FAIL per query.
"""
import json
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata is a single parquet FILE per table; Spark-written
        # scale data (ScaleData -> target/sf1) is a DIRECTORY of part files
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # manifest.json (written by Verify) lists the ATTEMPTED queries: an
    # attempted query with no result dir is a FAILURE (a dump that crashed
    # after writing a subset must not read as green), while queries excluded
    # by SPARK_GRAFT_VERIFY_ONLY are recorded as skipped, not ignored.
    manifest_path = f"{outdir}/manifest.json"
    attempted = set(json.load(open(manifest_path))) \
        if os.path.exists(manifest_path) else None
    results = {}
    skipped = []
    npass = nfail = 0
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{outdir}/{name}"):
            if attempted is None or name not in attempted:
                # partial dump (SPARK_GRAFT_VERIFY_ONLY, the sf1 gate):
                # deliberately not dumped
                skipped.append(name)
                continue
            print(f"FAIL {name}: attempted but no result dir written")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False,
                             "err": "attempted but no result dir"}
            nfail += 1
            continue
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
            sc = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols = [d[0] for d in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": str(e)[:300]}
            nfail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            results[name] = {"rows_match": len(orows) == len(srows),
                             "schema_match": False, "hash_match": False,
                             "err": None}
            nfail += 1
            continue
        c1, r1 = canon(orows, ocols)
        c2, r2 = canon(srows, scols)
        if len(r1) != len(r2):
            print(f"FAIL {name}: rowcount oracle={len(r1)} spark={len(r2)}")
            results[name] = {"rows_match": False, "schema_match": True,
                             "hash_match": False, "err": None,
                             "spark_rows": len(r2), "oracle_rows": len(r1)}
            nfail += 1
            continue
        bad = [(a, b) for a, b in zip(r1, r2) if a != b]
        ok = not bad
        results[name] = {"rows_match": True, "schema_match": True,
                         "hash_match": ok, "err": None,
                         "spark_rows": len(r2), "oracle_rows": len(r1)}
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"oracle={bad[0][0]} spark={bad[0][1]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(r1)} rows)")
            npass += 1
    if not results:
        # every oracle was skipped: a crashed/empty dump (or a misspelled
        # SPARK_GRAFT_VERIFY_ONLY) must not read as a green gate
        print("== 0 queries compared: no result dirs found — FAIL ==")
        sys.exit(1)
    print(f"== {npass} pass, {nfail} fail, {len(skipped)} skipped ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        if skipped:
            # sibling file keeps the main artifact a uniform per-query map
            # (consumers iterate its values as records)
            with open(json_out + ".skipped.json", "w") as f:
                json.dump(sorted(skipped), f)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
