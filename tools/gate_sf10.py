#!/usr/bin/env python3
"""sf10 (100x) correctness gate over the 8 scale-probe queries.

Usage: python3 tools/gate_sf10.py <sf10dir> <verify_out_dir> [json_out]

Per query, in its OWN subprocess (a DuckDB OOM on one oracle must not
take down the gate): run the full DuckDB-oracle compare (same canon as
tools/compare.py - columns sorted by name, rows sorted, floats rounded
to 9dp) under a memory limit + disk-spill temp dir and a wall-clock
budget. When the full oracle is infeasible at this scale (OOM/timeout),
fall back to a ROWS-ONLY structural check and RECORD the downgrade:

- q_cypher_expand / q_bm25 / q_salted_join: ScaleData replicates each
  copy with disjoint key spaces, per-doc word MULTISETS preserved (the
  text permutation reorders words within a doc), so per-copy join
  matches / term-presence / row counts are exactly those of the base
  corpus -> spark rows(sf10) == 100 * oracle rows(sf0.1); the sf0.1
  oracle runs in DuckDB in seconds.
- q_graph_pagerank: one rank row per node -> rows == count(events).
- q_dedup_minhash / q_dedup_simhash: copy 0 is byte-identical to
  sf0.1, other copies' per-doc permutations are doc-keyed (near-dup
  pairs there are corpus-specific), so the copy-0 SLICE of the result
  (both ids below the 1e9 copy stride) must hash-match the full sf0.1
  oracle result.
- q_cypher_varlen / q_graph_components: per-copy key spaces are
  disjoint, so results are 100 disjoint per-copy replicas -> the
  generic rows_only invariant applies when the full compare is
  infeasible.

Every fallback is labeled in the artifact ("mode": "rows_only" /
"slice_hash" with a reason); full compares are "mode": "full".
"""
import json
import multiprocessing as mp
import os
import sys

SF01 = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
MEM_LIMIT = os.environ.get("GATE_SF10_MEM", "48GB")
BUDGET_SEC = int(os.environ.get("GATE_SF10_BUDGET", "1500"))
# Spill sandbox: r12's minhash oracle wrote >54 GB to /tmp and a
# CONCURRENT sbt test run transiently failed 5 TCK scenarios with "No
# space left on device". The spill is bounded to a dedicated dir with a
# hard size cap (DuckDB raises instead of filling the disk -> the gate
# falls back to the documented structural check), and gate runs should
# be serialized against sbt test. The budget is recorded in the
# artifact's _config entry.
SPILL_DIR = os.environ.get("GATE_SF10_SPILL", "/tmp/duckdb_spill")
SPILL_CAP = os.environ.get("GATE_SF10_SPILL_CAP", "40GB")
# the band-chunked minhash oracle is 16 bounded runs + 3 materializations
# — slower than one query but bounded; it gets its own budget
MINHASH_BUDGET_SEC = int(os.environ.get("GATE_SF10_MINHASH_BUDGET", "3000"))
COPY_STRIDE = 10 ** 9  # ScaleData.OffBig: copy-0 doc ids are below this


def connect(sfdir):
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM_LIMIT}'")
    con.execute(f"SET temp_directory='{SPILL_DIR}'")
    con.execute(f"SET max_temp_directory_size='{SPILL_CAP}'")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(rows, cols):
    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def full_compare(sfdir, outdir, name, sql, q):
    """Child process: full oracle compare; posts a result dict."""
    try:
        con = connect(sfdir)
        oc = con.execute(sql)
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
        sc = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        if sorted(ocols) != sorted(scols):
            q.put({"mode": "full", "rows_match": len(orows) == len(srows),
                   "schema_match": False, "hash_match": False, "err": None})
            return
        _, r1 = canon(orows, ocols)
        _, r2 = canon(srows, scols)
        ok = len(r1) == len(r2) and all(a == b for a, b in zip(r1, r2))
        q.put({"mode": "full", "rows_match": len(r1) == len(r2),
               "schema_match": True, "hash_match": ok, "err": None,
               "spark_rows": len(r2), "oracle_rows": len(r1)})
    except Exception as e:  # OOM raises in duckdb; post and let parent fall back
        q.put({"mode": "full", "err": str(e)[:300]})


def spark_rows(outdir, name):
    import duckdb
    return duckdb.sql(
        f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]


def rows_only(sfdir, outdir, name, sql, reason):
    """100x row-count invariant vs the sf0.1 oracle (see module doc)."""
    con = connect(SF01)
    base = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    got = spark_rows(outdir, name)
    ok = got == 100 * base
    return {"mode": "rows_only", "reason": reason,
            "rows_match": ok, "schema_match": None, "hash_match": None,
            "spark_rows": got, "expected_rows": 100 * base, "err": None}


def pagerank_rows(sfdir, outdir, name, reason):
    con = connect(sfdir)
    n = con.execute("SELECT count(*) FROM events").fetchone()[0]
    got = spark_rows(outdir, name)
    return {"mode": "rows_only", "reason": reason,
            "rows_match": got == n, "schema_match": None,
            "hash_match": None, "spark_rows": got, "expected_rows": n,
            "err": None}


def minhash_full_chunked(sfdir, outdir, name, sql, q):
    """FULL minhash oracle at sf10, verified in bounded per-band chunks.

    The one-shot oracle spills >56 GB: the bands window runs over
    16 x n_docs rows and the common-shingle self-join builds on the full
    candidate set. The pipeline is band-separable though — cand is a
    DISTINCT union over bands and jaccard per pair is deterministic — so
    this materializes the per-doc stages ONCE (shh / sizes / sig) into a
    disk-backed DuckDB, then runs bandsf->cand->common->jaccard per band
    (1/16th the window and join footprint) and takes the DISTINCT union.
    Any oracle-parameter drift (cap, threshold) cannot silently pass:
    the band tail is extracted VERBATIM from the registered oracle SQL
    and the result still hash-compares against the Spark parquet.
    """
    try:
        dbfile = f"{SPILL_DIR}/minhash_oracle.db"
        if os.path.exists(dbfile):
            os.remove(dbfile)
        import duckdb
        con = duckdb.connect(dbfile)
        con.execute(f"SET memory_limit='{MEM_LIMIT}'")
        con.execute(f"SET temp_directory='{SPILL_DIR}'")
        con.execute(f"SET max_temp_directory_size='{SPILL_CAP}'")
        for t in TABLES:
            path = f"{sfdir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        # per-doc stages, computed once (CTE prefixes reused verbatim)
        cut_sizes = sql.index("sizes AS")
        shh_sql = sql[:cut_sizes].rstrip().rstrip(",") + \
            " SELECT * FROM shh"
        con.execute(f"CREATE TABLE shh_mat AS {shh_sql}")
        con.execute("CREATE TABLE sizes_mat AS SELECT doc_id, "
                    "count(*) AS n_sh FROM shh_mat GROUP BY 1")
        sig_body = sql[sql.index("sig AS (") + len("sig AS ("):
                       sql.index("bands AS (")].rstrip().rstrip(",").rstrip()
        if sig_body.endswith(")"):
            sig_body = sig_body[:-1]
        con.execute("CREATE TABLE sig_mat AS " +
                    sig_body.replace("FROM shh ", "FROM shh_mat "))
        # band tail taken verbatim from the oracle (cap/threshold included)
        tail = sql[sql.index("bandsf AS ("):] \
            .replace("JOIN shh ", "JOIN shh_mat ") \
            .replace("JOIN sizes ", "JOIN sizes_mat ")
        n_bands = sql.count("UNION ALL SELECT doc_id,") + 1
        con.execute("CREATE TABLE pairs (a BIGINT, b BIGINT, "
                    "jaccard DOUBLE)")
        for b in range(n_bands):
            h = 4 * b
            band_cte = (f"WITH bands AS (SELECT doc_id, {b} AS band, "
                        f"h{h} AS k0, h{h+1} AS k1, h{h+2} AS k2, "
                        f"h{h+3} AS k3 FROM sig_mat), ")
            con.execute(f"INSERT INTO pairs {band_cte}{tail}")
        oc = con.execute("SELECT DISTINCT a, b, jaccard FROM pairs")
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
        sc = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        con.close()
        os.remove(dbfile)
        if sorted(ocols) != sorted(scols):
            q.put({"mode": "full", "chunked": True,
                   "rows_match": len(orows) == len(srows),
                   "schema_match": False, "hash_match": False, "err": None})
            return
        _, r1 = canon(orows, ocols)
        _, r2 = canon(srows, scols)
        ok = len(r1) == len(r2) and all(a == b for a, b in zip(r1, r2))
        q.put({"mode": "full", "chunked": True, "bands": n_bands,
               "rows_match": len(r1) == len(r2), "schema_match": True,
               "hash_match": ok, "err": None,
               "spark_rows": len(r2), "oracle_rows": len(r1)})
    except Exception as e:
        q.put({"mode": "full", "chunked": True, "err": str(e)[:300]})


def simhash_banded_chunked(sfdir, outdir, name, sql, q):
    """FULL banded-SimHash oracle at sf10 in per-band chunks: the per-doc
    signature (sigb) is materialized once, then each rotation's
    window+self-join runs alone (1/4 the QUALIFY window), and the result
    is the DISTINCT union — identical math to the one-shot oracle, which
    exceeds the budget at 138M band rows. Band arms are extracted
    VERBATIM from the registered oracle SQL.
    """
    try:
        dbfile = f"{SPILL_DIR}/simhash_oracle.db"
        if os.path.exists(dbfile):
            os.remove(dbfile)
        import duckdb
        con = duckdb.connect(dbfile)
        con.execute(f"SET memory_limit='{MEM_LIMIT}'")
        con.execute(f"SET temp_directory='{SPILL_DIR}'")
        con.execute(f"SET max_temp_directory_size='{SPILL_CAP}'")
        for t in TABLES:
            path = f"{sfdir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        cut_rot = sql.index("rot AS (")
        sigb_sql = sql[:cut_rot].rstrip().rstrip(",") + \
            " SELECT * FROM sigb"
        con.execute(f"CREATE TABLE sigb_mat AS {sigb_sql}")
        rot_body = sql[cut_rot + len("rot AS ("):sql.index("rotf AS (")]
        rot_body = rot_body.rstrip().rstrip(",").rstrip()
        if rot_body.endswith(")"):
            rot_body = rot_body[:-1]
        arms = [a.strip().replace("FROM sigb", "FROM sigb_mat")
                for a in rot_body.split("UNION ALL")]
        tail = sql[sql.index("rotf AS ("):]
        con.execute("CREATE TABLE pairs (a BIGINT, b BIGINT, dist INT)")
        for arm in arms:
            con.execute(f"INSERT INTO pairs WITH rot AS ({arm}), {tail}")
        oc = con.execute("SELECT DISTINCT a, b, dist FROM pairs")
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
        sc = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in sc.description]
        srows = sc.fetchall()
        con.close()
        os.remove(dbfile)
        if sorted(ocols) != sorted(scols):
            q.put({"mode": "full", "chunked": True,
                   "rows_match": len(orows) == len(srows),
                   "schema_match": False, "hash_match": False, "err": None})
            return
        _, r1 = canon(orows, ocols)
        _, r2 = canon(srows, scols)
        ok = len(r1) == len(r2) and all(a == b for a, b in zip(r1, r2))
        q.put({"mode": "full", "chunked": True, "bands": len(arms),
               "rows_match": len(r1) == len(r2), "schema_match": True,
               "hash_match": ok, "err": None,
               "spark_rows": len(r2), "oracle_rows": len(r1)})
    except Exception as e:
        q.put({"mode": "full", "chunked": True, "err": str(e)[:300]})


def minhash_slice(outdir, name, sql, reason):
    """Copy-0 slice of the sf10 result must equal the sf0.1 oracle."""
    con = connect(SF01)
    oc = con.execute(sql)
    ocols = [d[0] for d in oc.description]
    orows = oc.fetchall()
    sc = con.execute(
        f"SELECT * FROM '{outdir}/{name}/*.parquet' "
        f"WHERE a < {COPY_STRIDE} AND b < {COPY_STRIDE}")
    scols = [d[0] for d in sc.description]
    srows = sc.fetchall()
    _, r1 = canon(orows, ocols)
    _, r2 = canon(srows, scols)
    ok = sorted(ocols) == sorted(scols) and r1 == r2
    return {"mode": "slice_hash", "reason": reason,
            "rows_match": len(r1) == len(r2), "schema_match": True,
            "hash_match": ok, "slice_rows": len(r2),
            "total_rows": spark_rows(outdir, name), "err": None}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    os.makedirs(SPILL_DIR, exist_ok=True)
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    names = [n for n in sorted(oracles) if os.path.isdir(f"{outdir}/{n}")]
    results = {}
    for name in names:
        sql = oracles[name]
        q = mp.Queue()
        p = mp.Process(target=full_compare, args=(sfdir, outdir, name, sql, q))
        p.start()
        p.join(BUDGET_SEC)
        res = None
        if p.is_alive():
            p.terminate()
            p.join()
            reason = f"full oracle exceeded {BUDGET_SEC}s at sf10"
        elif not q.empty():
            res = q.get()
            reason = f"full oracle failed at sf10: {res.get('err')}" \
                if res.get("err") else None
            if res.get("err"):
                res = None
        else:
            reason = "full-oracle subprocess died (OOM-killed)"
        if res is None and name == "q_dedup_simhash_banded":
            q2 = mp.Queue()
            p2 = mp.Process(target=simhash_banded_chunked,
                            args=(sfdir, outdir, name, sql, q2))
            p2.start()
            p2.join(MINHASH_BUDGET_SEC)
            if p2.is_alive():
                p2.terminate()
                p2.join()
                reason = (reason or "") + \
                    f"; chunked oracle exceeded {MINHASH_BUDGET_SEC}s"
            elif not q2.empty():
                r2 = q2.get()
                if r2.get("err"):
                    reason = (reason or "") + \
                        f"; chunked oracle failed: {r2['err']}"
                else:
                    r2["reason"] = reason
                    res = r2
        if res is None and name == "q_dedup_minhash":
            # second chance before the slice fallback: the band-chunked
            # FULL oracle (own subprocess + budget — it is 16 bounded
            # runs over materialized per-doc stages)
            q2 = mp.Queue()
            p2 = mp.Process(target=minhash_full_chunked,
                            args=(sfdir, outdir, name, sql, q2))
            p2.start()
            p2.join(MINHASH_BUDGET_SEC)
            if p2.is_alive():
                p2.terminate()
                p2.join()
                reason = (reason or "") + \
                    f"; chunked oracle exceeded {MINHASH_BUDGET_SEC}s"
            elif not q2.empty():
                r2 = q2.get()
                if r2.get("err"):
                    reason = (reason or "") + \
                        f"; chunked oracle failed: {r2['err']}"
                else:
                    r2["reason"] = reason
                    res = r2
        if res is None:
            try:
                if name == "q_graph_pagerank":
                    res = pagerank_rows(sfdir, outdir, name, reason)
                elif name in ("q_dedup_minhash", "q_dedup_simhash"):
                    # both emit (a, b, ...) pair rows; copy 0 is
                    # byte-identical to sf0.1 so its slice hash-checks
                    res = minhash_slice(outdir, name, sql, reason)
                else:
                    res = rows_only(sfdir, outdir, name, sql, reason)
            except Exception as e:
                res = {"mode": "fallback_failed", "reason": reason,
                       "rows_match": False, "hash_match": False,
                       "err": str(e)[:300]}
        results[name] = res
        ok = res.get("hash_match") if res.get("hash_match") is not None \
            else res.get("rows_match")
        print(f"{'PASS' if ok else 'FAIL'} {name} [{res['mode']}] {res}",
              flush=True)
    npass = sum(1 for r in results.values()
                if (r.get("hash_match") if r.get("hash_match") is not None
                    else r.get("rows_match")))
    print(f"== {npass}/{len(results)} pass ==", flush=True)
    if json_out:
        results["_config"] = {"mem_limit": MEM_LIMIT,
                              "budget_sec": BUDGET_SEC,
                              "spill_dir": SPILL_DIR,
                              "spill_cap": SPILL_CAP}
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
