package graft.operators

import graft.{QueryDef, Tables}
import graft.dedup.Dedup
import graft.sampling.Sampling
import graft.similarity.Similarity
import graft.text.{Ranking, TextOps}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents`/`embeddings`/`events`:
  * text analysis, dedup (exact → MinHash/SimHash), similarity search, JSON
  * extraction. Oracle-checked wherever the math is portable to DuckDB.
  */
object PipelineQueries {

  /** SQL replication of [[Similarity.lshBuckets]]: per table, the bucket is
    * the packed sign bits of projections onto the SAME deterministic
    * hyperplanes (coefficients inlined as literals; `list_inner_product`
    * sums in ascending index order like `graft_dot`). Assumes the testdata
    * embedding dim (64).
    */
  private def lshBucketsSql(bits: Int, tables: Int, dim: Int = 64): String =
    (0 until tables).map { t =>
      val bitTerms = (0 until bits).map { p =>
        val plane = (0 until dim)
          .map(j => Similarity.planeCoef(t, p, j)).mkString("[", ", ", "]")
        s"""(CASE WHEN list_inner_product($plane,
           |  CAST(embedding AS DOUBLE[])) >= 0
           |  THEN ${1L << p} ELSE 0 END)""".stripMargin
      }.mkString("\n + ")
      s"SELECT vec_id, $t AS tbl,\n $bitTerms AS bucket FROM embeddings"
    }.mkString("\nUNION ALL\n")

  /** SQL replication of [[Dedup.minHashDedup]] (shingle → graft_polyhash →
    * 64 affine min-hashes → 16×4 band buckets → exact-Jaccard ≥ 0.3), with
    * an optional bucket-size cap mirroring `lshCandidates(maxBucketSize)`.
    */
  private def minhashSql(cap: Option[Int]): String = {
    val sigCols = Dedup.minHashConstants(64).zipWithIndex.map {
      case ((a, b), i) =>
        s"min(($a * (sh % ${Dedup.MinHashP}) + $b) % ${Dedup.MinHashP}) AS h$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until 16).map { bnd =>
      val ks = (0 until 4).map(r => s"h${bnd * 4 + r} AS k$r").mkString(", ")
      s"SELECT doc_id, $bnd AS band, $ks FROM sig"
    }.mkString("\n  UNION ALL ")
    val bucketSrc = cap.map { c =>
      s"""bandsf AS (
         |  SELECT * FROM bands
         |  QUALIFY count(*) OVER (PARTITION BY band, k0, k1, k2, k3) <= $c),
         |""".stripMargin
    }.getOrElse("")
    val candFrom = if (cap.isDefined) "bandsf" else "bands"
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
       |  FROM documents),
       |sh0 AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
       |  FROM (SELECT doc_id, t,
       |          unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
       |        FROM toks)),
       |shh AS (
       |  SELECT doc_id, ${graft.plans.PolyHash.sql("shingle")} AS sh
       |  FROM sh0),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shh GROUP BY 1),
       |sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM shh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |${bucketSrc}cand AS (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |  FROM $candFrom l JOIN $candFrom r
       |    ON l.band = r.band AND l.k0 = r.k0 AND l.k1 = r.k1
       |   AND l.k2 = r.k2 AND l.k3 = r.k3 AND l.doc_id < r.doc_id),
       |common AS (
       |  SELECT c.a, c.b, count(*) AS n
       |  FROM cand c
       |  JOIN shh x ON x.doc_id = c.a
       |  JOIN shh y ON y.doc_id = c.b AND y.sh = x.sh
       |  GROUP BY 1, 2)
       |SELECT a, b, jaccard FROM (
       |  SELECT c.a, c.b,
       |    round(CAST(coalesce(cm.n, 0) AS DOUBLE)
       |          / (na.n_sh + nb.n_sh - coalesce(cm.n, 0)), 5) AS jaccard
       |  FROM cand c
       |  LEFT JOIN common cm ON cm.a = c.a AND cm.b = c.b
       |  JOIN sizes na ON na.doc_id = c.a
       |  JOIN sizes nb ON nb.doc_id = c.b)
       |WHERE jaccard >= 0.3""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ── text analysis ───────────────────────────────────────────────────────
    QueryDef(
      "q_doc_stats",
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS INT) AS n_upper,
        |  round(CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')), 5) AS mean_token_len
        |FROM documents""".stripMargin) { (s, dir) =>
      // token counting + quality signals (pure codegen'd expressions).
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_m"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.upperCount(col("text")).as("n_upper"),
        round(TextOps.meanTokenLen(col("text")), 5).as("mean_token_len"))
    },

    QueryDef(
      "q_doc_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(regexp_split_to_array(text, ''), c -> unicode(c))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |FROM documents""".stripMargin) { (s, dir) =>
      // rolling-hash content fingerprint, portable mod-1e9+7 arithmetic.
      Tables.documents(s, dir).select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
    },

    QueryDef(
      "q_text_langid",
      """SELECT doc_id, lang,
        |  CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
        |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_es >= s_fr THEN 'es'
        |       ELSE 'fr' END AS lang_guess
        |FROM (SELECT doc_id, lang,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|for|with)\b')) AS s_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|mit|ein)\b')) AS s_de,
        |  len(regexp_extract_all(lower(text), '\b(el|la|de|los|que|es|por|con)\b')) AS s_es,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|est|pour|dans)\b')) AS s_fr
        |  FROM documents)""".stripMargin) { (s, dir) =>
      // n-gram/stopword language ID heuristic (argmax, first-listed wins).
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_guess"))
    },

    QueryDef(
      "q_text_bpe_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
        |  )) AS INT) AS n_bpe,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_ws
        |FROM documents""".stripMargin) { (s, dir) =>
      // BPE-ish token counting: GPT-2 pre-tokenizer regex match count next
      // to the whitespace count (both one codegen'd pass; the regex is
      // portable Java<->RE2 so DuckDB oracles it exactly).
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe"),
        TextOps.tokenCount(col("text")).as("n_ws"))
    },

    QueryDef(
      "q_json_extract",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin) { (s, dir) =>
      // JSON property extraction (reference surface is toJSON-only; the
      // extraction direction is the pipeline-relevant extension).
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // ── dedup ───────────────────────────────────────────────────────────────
    QueryDef(
      "q_dedup_exact",
      """SELECT md5(text) AS content_hash, count(*) AS n_docs,
        |       min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))
    },

    QueryDef(
      "q_dedup_exact_keep",
      """SELECT doc_id FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text)
        |                           ORDER BY doc_id) = 1""".stripMargin) { (s, dir) =>
      Dedup.exactDedup(Tables.documents(s, dir)).select("doc_id")
    },

    QueryDef(
      "q_ngram_jaccard",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
        |        FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT d1.doc_id AS a, d2.doc_id AS b
        |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
        |common AS (
        |  SELECT p.a, p.b, count(*) AS c
        |  FROM pairs p
        |  JOIN sh sa ON sa.doc_id = p.a
        |  JOIN sh sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b,
        |  round(CAST(coalesce(c.c, 0) AS DOUBLE)
        |        / (na.n + nb.n - coalesce(c.c, 0)), 5) AS jaccard
        |FROM pairs p
        |LEFT JOIN common c ON c.a = p.a AND c.b = p.b
        |JOIN sizes na ON na.doc_id = p.a
        |JOIN sizes nb ON nb.doc_id = p.b""".stripMargin) { (s, dir) =>
      // exact word-3-gram Jaccard on adjacent-id candidate pairs (the
      // correctness anchor; MinHash below is the scalable candidate path).
      val docs = Tables.documents(s, dir)
      val ids = docs.select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      Dedup.jaccard(docs, pairs, 3)
    },

    QueryDef(
      "q_dedup_minhash",
      // Full SQL replication of the MinHash+LSH pipeline: same portable
      // shingle hash (graft_polyhash ≡ the double polynomial fold), same
      // affine signature constants (Dedup.minHashConstants), band buckets
      // keyed by the raw signature tuple, exact-Jaccard verify ≥ 0.3.
      // The gate exercises the PRODUCTION path: the default Σ bucket² skew
      // cap is ON (Dedup.DefaultMaxBucketSize) and the oracle replicates it
      // with the same QUALIFY window-count predicate.
      minhashSql(cap = Some(Dedup.DefaultMaxBucketSize))) { (s, dir) =>
      // MinHash(64) + LSH(16 bands × 4) candidates → exact-Jaccard ≥ 0.3,
      // hash-checked against the SQL replication above; DedupSpec
      // additionally checks candidate recall vs brute-force Jaccard.
      Dedup.minHashDedup(Tables.documents(s, dir), 0.3)
    },

    QueryDef(
      "q_dedup_minhash_capped",
      // Same pipeline under the Σ bucket² skew guard (maxBucketSize=5):
      // degenerate band buckets are dropped before the candidate self-join
      // (oracle: QUALIFY on the bucket's window count).
      minhashSql(cap = Some(5))) { (s, dir) =>
      Dedup.minHashDedup(Tables.documents(s, dir), 0.3, maxBucketSize = 5)
    },

    QueryDef(
      "q_dedup_simhash",
      // SQL replication of the SimHash pipeline: same portable token hash
      // (double polynomial fold ≡ graft_polyhash), 62 per-bit +1/−1 sums,
      // 16-bit-prefix blocking, hamming ≤ 16 via bit_count(xor). sigf
      // replicates the production prefix-bucket cap (Dedup.capBuckets with
      // the corpus-derived default — the same QUALIFY predicate as every
      // other LSH gate).
      {
        val bitSums = (0 until Dedup.SimHashBits).map { b =>
          s"sum(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
        }.mkString(",\n    ")
        val sigExpr = (0 until Dedup.SimHashBits).map { b =>
          s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH tok AS (
           |  SELECT doc_id,
           |         unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
           |           AS token
           |  FROM documents),
           |th AS (
           |  SELECT doc_id, ${graft.plans.PolyHash.sql("token")} AS th
           |  FROM tok),
           |sums AS (
           |  SELECT doc_id,
           |    $bitSums
           |  FROM th GROUP BY doc_id),
           |sig AS (
           |  SELECT doc_id, $sigExpr AS simhash,
           |         ($sigExpr) >> ${Dedup.SimHashBits - 16} AS prefix
           |  FROM sums),
           |sigf AS (
           |  SELECT * FROM sig
           |  QUALIFY count(*) OVER (PARTITION BY prefix)
           |          <= ${Dedup.DefaultMaxBucketSize})
           |SELECT l.doc_id AS a, r.doc_id AS b,
           |       CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS dist
           |FROM sigf l JOIN sigf r
           |  ON l.prefix = r.prefix AND l.doc_id < r.doc_id
           |WHERE bit_count(xor(l.simhash, r.simhash)) <= 16""".stripMargin
      }) { (s, dir) =>
      // SimHash-62 near-dup pairs, 16-bit-prefix blocking, hamming ≤ 16,
      // hash-checked against the SQL replication above (incl. the prefix
      // bucket cap — corpus-derived ≡ 1000 on every test SF).
      Dedup.simHashPairs(Tables.documents(s, dir), 16, 16)
    },

    QueryDef(
      "q_dedup_simhash_banded",
      // Multi-band SimHash (rotations=4): each band re-keys the prefix
      // join on a 15-bit-rotated signature window — recall at maxDist=10
      // lifts 0.26 → 0.66 vs the single high-bit band (DedupSpec
      // quantifies it). Oracle: the same rotate-and-QUALIFY per band,
      // UNION ALL, DISTINCT pairs — band-exact replication.
      {
        val bitSums = (0 until Dedup.SimHashBits).map { b =>
          s"sum(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
        }.mkString(",\n    ")
        val sigExpr = (0 until Dedup.SimHashBits).map { b =>
          s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
        val bits = Dedup.SimHashBits
        val rotations = 4
        val step = bits / rotations
        // rotate without BIGINT overflow: keep only the low (bits−k) bits
        // before shifting left (the high k bits wrap to the bottom)
        def rot(i: Int): String = {
          val k = i * step
          if (k == 0) "simhash"
          else s"(((simhash & ${(1L << (bits - k)) - 1}) << $k) | (simhash >> ${bits - k}))"
        }
        val bandSel = (0 until rotations).map { i =>
          s"SELECT doc_id, simhash, $i AS band, (${rot(i)} >> ${bits - 16}) AS prefix FROM sigb"
        }.mkString("\n  UNION ALL ")
        s"""WITH tok AS (
           |  SELECT doc_id,
           |         unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
           |           AS token
           |  FROM documents),
           |th AS (
           |  SELECT doc_id, ${graft.plans.PolyHash.sql("token")} AS th
           |  FROM tok),
           |sums AS (
           |  SELECT doc_id,
           |    $bitSums
           |  FROM th GROUP BY doc_id),
           |sigb AS (
           |  SELECT doc_id, $sigExpr AS simhash
           |  FROM sums),
           |rot AS (
           |  $bandSel),
           |rotf AS (
           |  SELECT * FROM rot
           |  QUALIFY count(*) OVER (PARTITION BY band, prefix)
           |          <= ${Dedup.DefaultMaxBucketSize})
           |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
           |       CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS dist
           |FROM rotf l JOIN rotf r
           |  ON l.band = r.band AND l.prefix = r.prefix AND l.doc_id < r.doc_id
           |WHERE bit_count(xor(l.simhash, r.simhash)) <= 10""".stripMargin
      }) { (s, dir) =>
      Dedup.simHashPairs(Tables.documents(s, dir), 10, 16, rotations = 4)
    },

    QueryDef(
      "q_dedup_embed",
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 5) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 5) >= 0.2""".stripMargin) { (s, dir) =>
      // embedding-cosine near-dup, exact pairs (bounded window); the LSH
      // candidate path is q_dedup_embed_lsh below.
      Dedup.embeddingNearDupsExact(
        Tables.embeddings(s, dir).filter(col("vec_id") < 300), 0.2)
    },

    QueryDef(
      "q_dedup_embed_lsh",
      // bucketsf: the QUALIFY replication of the production bucket cap
      // (Dedup.capBuckets with DefaultMaxBucketSize) — oracle and engine
      // run the same guarded candidate set
      s"""WITH buckets AS (
         |${lshBucketsSql(6, 8)}),
         |bucketsf AS (
         |  SELECT * FROM buckets
         |  QUALIFY count(*) OVER (PARTITION BY tbl, bucket)
         |          <= ${Dedup.DefaultMaxBucketSize}),
         |cand AS (
         |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM bucketsf l JOIN bucketsf r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings)
         |SELECT a, b, sim FROM (
         |  SELECT c.a, c.b,
         |    round(list_inner_product(x.emb, y.emb)
         |          / (sqrt(list_inner_product(x.emb, x.emb))
         |             * sqrt(list_inner_product(y.emb, y.emb))), 5) AS sim
         |  FROM cand c
         |  JOIN v x ON x.vec_id = c.a
         |  JOIN v y ON y.vec_id = c.b)
         |WHERE sim >= 0.3""".stripMargin) { (s, dir) =>
      // scale path: LSH-bucket candidates + exact cosine verify — the SQL
      // oracle replicates the identical deterministic hyperplanes; recall
      // vs exact also measured in DedupSpec. Threshold 0.3 (testdata
      // cosines top out ~0.5); 6 bits × 8 tables.
      Dedup.embeddingNearDups(Tables.embeddings(s, dir), 0.3, 6, 8)
    },

    // ── similarity search ───────────────────────────────────────────────────
    QueryDef(
      "q_knn_cosine",
      """WITH q AS (SELECT vec_id AS a, embedding AS ea
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS b, embedding AS eb FROM embeddings)
        |SELECT a, b, sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a, b,
        |    round(list_cosine_similarity(CAST(ea AS DOUBLE[]),
        |                                 CAST(eb AS DOUBLE[])), 5) AS sim,
        |    row_number() OVER (PARTITION BY a ORDER BY
        |      round(list_cosine_similarity(CAST(ea AS DOUBLE[]),
        |                                   CAST(eb AS DOUBLE[])), 5) DESC,
        |      b) AS rank
        |  FROM q JOIN c ON a <> b)
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      // brute-force cosine top-3 for a 50-query batch (exact baseline).
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), 3)
    },

    QueryDef(
      "q_ann_lsh",
      // bucketsf mirrors the production bucket cap (Dedup.capBuckets)
      s"""WITH buckets AS (
         |${lshBucketsSql(8, 8)}),
         |bucketsf AS (
         |  SELECT * FROM buckets
         |  QUALIFY count(*) OVER (PARTITION BY tbl, bucket)
         |          <= ${Dedup.DefaultMaxBucketSize}),
         |cand0 AS (
         |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM bucketsf l JOIN bucketsf r
         |    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
         |cand AS (SELECT a, b FROM cand0
         |         UNION ALL SELECT b AS a, a AS b FROM cand0),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings),
         |scored AS (
         |  SELECT c.a, c.b,
         |    round(list_inner_product(x.emb, y.emb)
         |          / (sqrt(list_inner_product(x.emb, x.emb))
         |             * sqrt(list_inner_product(y.emb, y.emb))), 5) AS sim
         |  FROM cand c
         |  JOIN v x ON x.vec_id = c.a
         |  JOIN v y ON y.vec_id = c.b)
         |SELECT a, b, sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT a, b, sim,
         |    row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rank
         |  FROM scored)
         |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      // ANN: random-hyperplane LSH, 8 tables × 8 bits → in-bucket exact
      // rank, hash-checked against the SQL hyperplane replication;
      // PipelineSpec measures recall vs brute force.
      Similarity.annTopK(Tables.embeddings(s, dir), 3, 8, 8)
    },

    QueryDef(
      "q_ann_ivf",
      // SQL replication of the IVF path with sampled (iters=0) centroids:
      // deterministic id-stride seed cells, argmin by (‖c‖² − 2x·c, cell),
      // queries probe their 4 nearest of 16 cells, exact cosine rank ≤ 3
      // in-cell. (The Lloyd-refined variant stays spec-tested — iterative
      // float means aren't bit-portable across engines.)
      """WITH cents AS (
        |  SELECT CAST(vec_id / (SELECT greatest(count(*) // 16, 1)
        |                        FROM embeddings) AS INT) AS cell,
        |         CAST(embedding AS DOUBLE[]) AS centroid
        |  FROM embeddings
        |  WHERE vec_id % (SELECT greatest(count(*) // 16, 1)
        |                  FROM embeddings) = 0
        |  ORDER BY vec_id LIMIT 16),
        |scored_cents AS (
        |  SELECT cell, centroid,
        |         list_inner_product(centroid, centroid) AS cn2
        |  FROM cents),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |      FROM embeddings),
        |assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT v.vec_id, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        c.cn2 - 2.0 * list_inner_product(v.emb, c.centroid), c.cell)
        |        AS rn
        |    FROM v CROSS JOIN scored_cents c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT a, cell FROM (
        |    SELECT v.vec_id AS a, c.cell,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        c.cn2 - 2.0 * list_inner_product(v.emb, c.centroid), c.cell)
        |        AS rn
        |    FROM v CROSS JOIN scored_cents c
        |    WHERE v.vec_id < 50)
        |  WHERE rn <= 4),
        |cand AS (
        |  SELECT DISTINCT p.a, s.vec_id AS b
        |  FROM probes p JOIN assign s ON s.cell = p.cell
        |  WHERE p.a <> s.vec_id),
        |scored AS (
        |  SELECT c.a, c.b,
        |    round(list_inner_product(x.emb, y.emb)
        |          / (sqrt(list_inner_product(x.emb, x.emb))
        |             * sqrt(list_inner_product(y.emb, y.emb))), 5) AS sim
        |  FROM cand c
        |  JOIN v x ON x.vec_id = c.a
        |  JOIN v y ON y.vec_id = c.b)
        |SELECT a, b, sim, CAST(rank AS INT) AS rank FROM (
        |  SELECT a, b, sim,
        |    row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      // ANN, IVF path with sampled centroids (iters=0 — bit-portable,
      // hash-checked above); PipelineSpec measures the k-means-refined
      // variant's recall vs brute force.
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 50), 3, 16, 4, 0)
    },

    // ── splits / sampling / ranking / clustering ────────────────────────────
    QueryDef(
      "q_split_hash",
      s"""SELECT doc_id, CAST(bucket AS INT) AS bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        ${Sampling.hashBucketSql("text")} AS bucket
         |      FROM documents)""".stripMargin) { (s, dir) =>
      // Deterministic content-keyed train/valid/test split (80/10/10):
      // pure projection inside the scan — reproducible, shuffle-free, and
      // exact duplicates land in the same split (no train/test leakage).
      graft.plans.GraftExtensions.ensureFunctions(s)
      val bucket = Sampling.hashBucket(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        bucket.cast("int").as("bucket"),
        Sampling.split(bucket, 80, 10).as("split"))
    },

    QueryDef(
      "q_sample_stratified",
      s"""SELECT doc_id, lang
         |FROM (SELECT doc_id, lang,
         |        ${Sampling.hashBucketSql("text")} AS bucket
         |      FROM documents)
         |WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin) { (s, dir) =>
      // Stratified deterministic sampling: per-stratum rates (10% of the
      // dominant language, 50% of the rest — the usual rebalancing shape)
      // via the same content-keyed bucket; no shuffle, no rand() (which
      // would resample per run and per partition layout).
      graft.plans.GraftExtensions.ensureFunctions(s)
      val bucket = Sampling.hashBucket(col("text"))
      Tables.documents(s, dir)
        .filter(bucket < when(col("lang") === "en", 10).otherwise(50))
        .select("doc_id", "lang")
    },

    QueryDef(
      "q_doc_repetition",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS gram
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 1, 1))) AS i
        |        FROM toks)),
        |pg AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2)
        |SELECT doc_id,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
        |        / sum(cnt), 5) AS dup_2gram_frac,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 5) AS top_2gram_frac
        |FROM pg GROUP BY 1""".stripMargin) { (s, dir) =>
      // Gopher/C4-style repetition quality signals: duplicate-2-gram mass
      // and the most-frequent-2-gram share, per document.
      Dedup.repetitionSignals(Tables.documents(s, dir))
    },

    QueryDef(
      "q_contamination",
      // Eval-set decontamination: corpus docs (id ≥ 5) sharing ≥1 hashed
      // word-3-gram with the probe docs (id < 5). Same portable polyhash
      // fold as the MinHash oracle.
      {
        s"""WITH toks AS (
           |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
           |  FROM documents),
           |sh0 AS (
           |  SELECT DISTINCT doc_id,
           |         array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
           |  FROM (SELECT doc_id, t,
           |          unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
           |        FROM toks)),
           |shh AS (
           |  SELECT doc_id, ${graft.plans.PolyHash.sql("shingle")} AS sh
           |  FROM sh0),
           |probe AS (SELECT DISTINCT sh FROM shh WHERE doc_id < 5)
           |SELECT s.doc_id, count(*) AS n_shared
           |FROM shh s JOIN probe USING (sh)
           |WHERE s.doc_id >= 5
           |GROUP BY 1""".stripMargin
      }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.contamination(
        docs.filter(col("doc_id") >= 5), docs.filter(col("doc_id") < 5))
    },

    QueryDef(
      "q_bm25",
      Ranking.bm25Sql(Seq("spark", "merge", "filter"))) { (s, dir) =>
      // BM25 relevance over the fulltext surface (reference's queryNodes
      // score column, `src/procedures/proc_fulltext_query.c`): corpus stats
      // broadcast against per-doc term frequencies.
      Ranking.bm25(Tables.documents(s, dir), Seq("spark", "merge", "filter"))
    },

    QueryDef(
      "q_dedup_cluster",
      // Transitive closure of the MinHash near-dup pairs (recursive CTE) →
      // canonical (smallest) doc id per cluster; mirrors GraphX connected
      // components over the verified pair graph.
      // the pair source replicates the CAPPED production path, matching
      // nearDupClusters -> minHashDedup's DefaultMaxBucketSize guard
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a, b FROM (
         |${minhashSql(cap = Some(Dedup.DefaultMaxBucketSize))})),
         |und AS (SELECT a AS x, b AS y FROM pairs
         |        UNION SELECT b, a FROM pairs),
         |reach AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM reach r JOIN und u ON u.x = r.y)
         |SELECT CAST(x AS BIGINT) AS doc_id,
         |       CAST(least(x, min(y)) AS BIGINT) AS canonical_id
         |FROM reach GROUP BY x""".stripMargin) { (s, dir) =>
      // Near-dup clusters: connected components (GraphX) over the verified
      // MinHash pair graph — dedup policy "keep one doc per near-dup chain".
      Dedup.nearDupClusters(Tables.documents(s, dir), 0.3)
    })
}
