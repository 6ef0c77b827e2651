package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.ml.{BaselineRateModel, ClassWeighter}
import graft.operators.{Dedup, MmrRerank, SimilaritySearch, ThresholdMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity-search + ML-side relational coverage:
  * brute-force/IVF ANN over `embeddings`, embedding near-dup, the
  * threshold-metrics curve (SURVEY §2 M10), the single-pass baseline
  * rate model (M8), and class weighting (M3).
  */
object VectorMlQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** DuckDB double-precision cosine between two DOUBLE[] columns. */
  private def cosSql(a: String, b: String): String =
    s"""(CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0
       | THEN 0.0
       | ELSE list_dot_product($a, $b)
       |      / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END)""".stripMargin

  /** Oracle for the deterministic IVF plan (centroids = vec_id ≡ 0 mod
    * 31; assignment = argmax cosine, ties to the smallest cent_id; each
    * query probes its 4 nearest centroids; top-5 within probed buckets).
    * `final_` picks the reported shape: the top-k rows themselves, or
    * recall@5 against the exact brute-force top-k.
    */
  private def ivfSql(final_ : String): String = {
    val base =
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id < 8),
         |cent AS (SELECT vec_id AS cent_id, cv AS cent_v FROM c WHERE vec_id % 31 = 0),
         |assigned AS (
         |  SELECT vec_id, cv, cent_id FROM (
         |    SELECT c.vec_id, c.cv, cent.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosSql("c.cv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM c CROSS JOIN cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cent_id FROM (
         |    SELECT q.query_id, q.qv, cent.cent_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY ${cosSql("q.qv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM q CROSS JOIN cent)
         |  WHERE rn <= 4),
         |scored AS (
         |  SELECT p.query_id, a.vec_id, ${cosSql("p.qv", "a.cv")} AS cosine
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE p.query_id != a.vec_id),
         |ivf AS (
         |  SELECT query_id, vec_id, cosine, rk FROM (
         |    SELECT query_id, vec_id, cosine,
         |           row_number() OVER (PARTITION BY query_id
         |                              ORDER BY cosine DESC, vec_id) AS rk
         |    FROM scored)
         |  WHERE rk <= 5)""".stripMargin
    final_ match {
      case "topk" =>
        s"""$base
           |SELECT query_id, vec_id, round(cosine, 5) AS cosine, rk
           |FROM ivf ORDER BY query_id, rk""".stripMargin
      case "sweep" =>
        // probes keeps rn (<= 4); each sweep point replays the search
        // restricted to its own rn <= np prefix of probed centroids
        s"""${base.replace("  SELECT query_id, qv, cent_id FROM (", "  SELECT query_id, qv, cent_id, rn FROM (")},
           |sweep AS (SELECT unnest([1, 2, 4]) AS np),
           |scored_np AS (
           |  SELECT s.np, p.query_id, a.vec_id, ${cosSql("p.qv", "a.cv")} AS cosine
           |  FROM probes p JOIN sweep s ON p.rn <= s.np
           |  JOIN assigned a ON a.cent_id = p.cent_id
           |  WHERE p.query_id != a.vec_id),
           |ivf_np AS (
           |  SELECT np, query_id, vec_id FROM (
           |    SELECT np, query_id, vec_id,
           |           row_number() OVER (PARTITION BY np, query_id
           |                              ORDER BY cosine DESC, vec_id) AS rk
           |    FROM scored_np)
           |  WHERE rk <= 5),
           |pairs AS (
           |  SELECT q.query_id, c.vec_id, ${cosSql("q.qv", "c.cv")} AS cosine
           |  FROM q CROSS JOIN c WHERE q.query_id != c.vec_id),
           |brute AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |           row_number() OVER (PARTITION BY query_id
           |                              ORDER BY cosine DESC, vec_id) AS rk
           |    FROM pairs)
           |  WHERE rk <= 5)
           |SELECT cast(s.np AS int) AS nprobe,
           |       cast(count(*) AS bigint) AS n_exact,
           |       cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           |         AS n_recalled,
           |       round(cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           |             / cast(count(*) AS bigint), 4) AS recall_at_5
           |FROM sweep s CROSS JOIN brute b
           |LEFT JOIN ivf_np i
           |  ON i.np = s.np AND b.query_id = i.query_id AND b.vec_id = i.vec_id
           |GROUP BY s.np ORDER BY nprobe""".stripMargin
      case "recall" =>
        s"""$base,
           |pairs AS (
           |  SELECT q.query_id, c.vec_id, ${cosSql("q.qv", "c.cv")} AS cosine
           |  FROM q CROSS JOIN c WHERE q.query_id != c.vec_id),
           |brute AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |           row_number() OVER (PARTITION BY query_id
           |                              ORDER BY cosine DESC, vec_id) AS rk
           |    FROM pairs)
           |  WHERE rk <= 5)
           |SELECT cast(count(*) AS bigint) AS n_exact,
           |       cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           |         AS n_recalled,
           |       round(cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           |             / cast(count(*) AS bigint), 4) AS recall_at_5
           |FROM brute b LEFT JOIN ivf i
           |  ON b.query_id = i.query_id AND b.vec_id = i.vec_id""".stripMargin
    }
  }

  /** Oracle for the multi-table hyperplane-LSH near-dup query: replays
    * graft.operators.Dedup.embeddingNearDupPairs(dim=64, cos≥0.35,
    * nBits=4, nTables=8, seed=42) with the same plane literals
    * (VectorFunctions.planeValues — Double.toString round-trips exactly).
    */
  private def neardupSql: String = {
    val (nBits, nTables, dim, seed) = (4, 8, 64, 42L)
    def planeLit(s: Long, i: Int): String =
      graft.functions.VectorFunctions.planeValues(s, i, dim)
        .map(_.toString).mkString("[", ", ", "]")
    val tables = (0 until nTables).map { tbl =>
      val s = seed + 7919L * tbl
      val bucket = (0 until nBits).map { i =>
        s"(CASE WHEN list_dot_product(vd, ${planeLit(s, i)}) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("\n     + ")
      s"  SELECT vec_id, $tbl AS tbl,\n       $bucket AS bucket FROM v"
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vd FROM embeddings),
       |hashed AS (
       |$tables),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM hashed a JOIN hashed b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pairs AS (
       |  SELECT id_a, id_b, ${cosSql("va.vd", "vb.vd")} AS cosine
       |  FROM cand JOIN v va ON va.vec_id = cand.id_a
       |            JOIN v vb ON vb.vec_id = cand.id_b)
       |SELECT id_a, id_b, round(cosine, 5) AS cosine
       |FROM pairs WHERE cosine >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // Per-label embedding norm stats — exercises zip_with/aggregate
    // higher-order-function math against DuckDB list functions.
    Q("q_vector_norm_stats",
      """SELECT label, count(*) AS n_vecs,
        |       round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
        |         AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          sqrt(VectorFunctions.normSq(VectorFunctions.toDoubleArray(col("embedding"))))
            .as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), round(avg(col("norm")), 4).as("avg_norm"))
        .orderBy(col("label"))
    },

    // Int8 scalar quantization of the embedding corpus (float32 → 1
    // byte/dim storage): per-dimension min/max codebook in one aggregate
    // pass, codes + reconstruction errors per row in codegen'd array
    // transforms. The oracle replays codebook, code arithmetic, and
    // dequantization element-wise — sum_codes is an EXACT integer gate
    // over every code in the corpus, max_abs_err an order-independent
    // double gate; mean_abs_err follows house rounding (4 dp).
    Q("q_vector_quantize_int8",
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |ex AS (SELECT vec_id, label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        |       FROM v),
        |cb AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
        |codes AS (
        |  SELECT vec_id, label, x, mn, mx,
        |         CAST(least(greatest(
        |             CASE WHEN mx = mn THEN 0.0
        |                  ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END,
        |             0.0), 255.0) AS BIGINT) AS code
        |  FROM ex JOIN cb USING (pos)),
        |errs AS (
        |  SELECT vec_id, label, code,
        |         abs(x - (CASE WHEN mx = mn THEN mn
        |                       ELSE mn + code * (mx - mn) / 255.0 END)) AS err
        |  FROM codes)
        |SELECT cast(label AS int) AS label,
        |       cast(count(DISTINCT vec_id) AS bigint) AS n_vecs,
        |       cast(sum(code) AS bigint) AS sum_codes,
        |       round(max(err), 6) AS max_abs_err,
        |       round(sum(err) / (64 * count(DISTINCT vec_id)), 4) AS mean_abs_err
        |FROM errs GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      import graft.operators.VectorQuantization
      val q = VectorQuantization.quantizeWithError(
        t(s, dir, "embeddings").select(col("vec_id"), col("label"),
          VectorFunctions.toDoubleArray(col("embedding")).as("v")),
        vecCol = "v")
      q.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("code_sum")).as("sum_codes"),
          round(max(col("err_max")), 6).as("max_abs_err"),
          round(sum(col("err_sum")) / (lit(64) * count(lit(1))), 4).as("mean_abs_err"))
        .orderBy(col("label"))
    },

    // Quantized first-stage ANN (SDC): rank by the exact integer dot
    // product of int8 codes — the ¼-bytes scan that precedes exact
    // re-ranking at scale — and score its top-5 recall against the
    // float cosine ranking per query. Both rankings are deterministic
    // (integer scores; tie-break on vec_id), so recall itself is
    // oracle-replayed, not just bounded.
    Q("q_ann_quantized_recall", {
      val cos = cosSql("eq.qv", "ec.cv")
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ex AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v),
        |cb AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
        |codes AS (
        |  SELECT vec_id, pos,
        |         CAST(least(greatest(
        |             CASE WHEN mx = mn THEN 0.0
        |                  ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END,
        |             0.0), 255.0) AS BIGINT) - 128 AS code
        |  FROM ex JOIN cb USING (pos)),
        |cl AS (SELECT vec_id, list(code ORDER BY pos) AS codes FROM codes GROUP BY vec_id),
        |qtop AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.vec_id AS query_id, c.vec_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_dot_product(q.codes::DOUBLE[], c.codes::DOUBLE[]) DESC,
        |                      c.vec_id) AS rk
        |    FROM (SELECT * FROM cl WHERE vec_id < 8) q
        |    JOIN cl c ON c.vec_id != q.vec_id)
        |  WHERE rk <= 5),
        |eq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |       FROM embeddings WHERE vec_id < 8),
        |ec AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |etop AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT eq.query_id, ec.vec_id,
        |           row_number() OVER (PARTITION BY eq.query_id
        |             ORDER BY """.stripMargin + cos + """ DESC, ec.vec_id) AS rk
        |    FROM eq CROSS JOIN ec WHERE eq.query_id != ec.vec_id)
        |  WHERE rk <= 5),
        |hits AS (
        |  SELECT q.query_id, count(*) AS n
        |  FROM qtop q JOIN etop e USING (query_id, vec_id) GROUP BY 1)
        |SELECT q.query_id, cast(coalesce(n, 0) AS int) AS n_hits,
        |       cast(coalesce(n, 0) AS double) / 5.0 AS recall5
        |FROM (SELECT DISTINCT query_id FROM qtop) q
        |LEFT JOIN hits USING (query_id)
        |ORDER BY query_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.{SimilaritySearch, VectorQuantization}
      val emb = t(s, dir, "embeddings")
      // persist: the coded corpus feeds the (broadcast) query side and
      // the corpus scan of the quantized ranking
      val coded = VectorQuantization.quantizeWithError(
          emb.select(col("vec_id"), VectorFunctions.toDoubleArray(col("embedding")).as("v")),
          vecCol = "v")
        .select(col("vec_id"), col("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qtop = SimilaritySearch.quantizedTopK(
        coded.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("codes").as("qcodes")),
        coded, k = 5)
      val etop = SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        emb, k = 5)
      val hits = qtop.as("q")
        .join(etop.as("e"),
          col("q.query_id") === col("e.query_id") && col("q.vec_id") === col("e.vec_id"))
        .groupBy(col("q.query_id"))
        .agg(count(lit(1)).as("n"))
      qtop.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left_outer")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).cast("int").as("n_hits"),
          (coalesce(col("n"), lit(0L)).cast("double") / 5.0).as("recall5"))
        .orderBy(col("query_id"))
    },

    // Two-stage ANN retrieval (the production shape): int8-code integer
    // dot selects a 20-candidate shortlist per query, exact float cosine
    // re-ranks ONLY the shortlist to top-5. The oracle replays the
    // codebook, the integer shortlist ranking, AND the re-rank — hash
    // equality proves the full-precision corpus is consulted exactly
    // where the operator claims.
    Q("q_ann_two_stage", {
      val cos = cosSql("q.qv", "f.v")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |ex AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v),
         |cb AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
         |codes AS (
         |  SELECT vec_id, pos,
         |         CAST(least(greatest(
         |             CASE WHEN mx = mn THEN 0.0
         |                  ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END,
         |             0.0), 255.0) AS BIGINT) - 128 AS code
         |  FROM ex JOIN cb USING (pos)),
         |cl AS (SELECT vec_id, list(code ORDER BY pos) AS codes FROM codes GROUP BY vec_id),
         |short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY list_dot_product(q.codes::DOUBLE[], c.codes::DOUBLE[]) DESC,
         |                      c.vec_id) AS rk
         |    FROM (SELECT * FROM cl WHERE vec_id < 8) q
         |    JOIN cl c ON c.vec_id != q.vec_id)
         |  WHERE rk <= 20),
         |qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 8),
         |rr AS (
         |  SELECT s.query_id, s.vec_id, $cos AS cosine
         |  FROM short s JOIN qv q USING (query_id) JOIN v f ON f.vec_id = s.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, vec_id) AS rk
         |  FROM rr)
         |SELECT query_id, vec_id, round(cosine, 5) AS cosine, rk
         |FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.VectorQuantization
      val emb = t(s, dir, "embeddings")
      val coded = VectorQuantization.quantizeWithError(
          emb.select(col("vec_id"), VectorFunctions.toDoubleArray(col("embedding")).as("v")),
          vecCol = "v")
        .select(col("vec_id"), col("codes"))
      // persist: the coded+float corpus feeds the (broadcast) query
      // side, the shortlist scan, and the re-rank join
      val corpus = emb.select(col("vec_id"), col("embedding")).join(coded, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val queries = corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("codes").as("qcodes"))
      SimilaritySearch.twoStageTopK(queries, corpus, k = 5, shortlist = 20)
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 5).as("cosine"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    },

    // Product quantization + ADC scoring (operators/ProductQuantization):
    // 64-dim vectors → 8 subspaces × 8 dims, codebooks = every 41st
    // corpus vector's subvectors, codes = per-subspace argmin-L2 entry,
    // query scores = subspace-ORDERED sums of distance-table lookups —
    // every float op is a left-to-right dot product, so the oracle
    // replays encode + ADC bit-exactly (list_reduce = Spark's ordered
    // aggregate fold).
    Q("q_ann_pq_adc", {
      def d2Sql(a: String, b: String) =
        s"(list_dot_product($a, $a) + list_dot_product($b, $b) - 2 * list_dot_product($a, $b))"
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id < 8),
         |js AS (SELECT unnest(range(8)) AS j),
         |cb AS (
         |  SELECT js.j, vec_id AS code_id, cv[js.j*8+1 : js.j*8+8] AS cb_v
         |  FROM c CROSS JOIN js WHERE vec_id % 41 = 0),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT c.vec_id, cb.j, cb.code_id AS code,
         |           row_number() OVER (PARTITION BY c.vec_id, cb.j
         |             ORDER BY ${d2Sql("c.cv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")},
         |                      cb.code_id) AS rn
         |    FROM c CROSS JOIN cb)
         |  WHERE rn = 1),
         |dt AS (
         |  SELECT q.query_id, cb.j, cb.code_id AS code,
         |         ${d2Sql("q.qv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")} AS dd
         |  FROM q CROSS JOIN cb),
         |scored AS (
         |  SELECT d.query_id, e.vec_id,
         |         list_reduce(list_prepend(0.0, list(d.dd ORDER BY e.j)),
         |                     (acc, x) -> acc + x) AS adc_d2
         |  FROM enc e JOIN dt d ON e.j = d.j AND e.code = d.code
         |  WHERE d.query_id != e.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, round(adc_d2, 5) AS adc_d2, rk FROM (
         |  SELECT query_id, vec_id, adc_d2,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY adc_d2, vec_id) AS rk
         |  FROM scored)
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.ProductQuantization
      val emb = t(s, dir, "embeddings")
      val cb = ProductQuantization.modularCodebooks(emb, m = 8, subDim = 8, step = 41)
      val encoded = ProductQuantization.encode(emb, cb, m = 8, subDim = 8)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      ProductQuantization.adcTopK(queries, encoded, cb, k = 5, m = 8, subDim = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("adc_d2"), 5).as("adc_d2"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF-PQ — the canonical billion-vector index (inverted lists of PQ
    // codes, no floats in the index): one corpus pass assigns + encodes;
    // probing restricts ADC to the probed lists. Composes the two
    // oracle-proven halves, and the oracle replays the composition:
    // argmax-cosine assignment (as q_ann_ivf_topk) ∘ PQ encode + ADC
    // (as q_ann_pq_adc) over only the probed partitions.
    Q("q_ann_ivfpq_topk", {
      def d2Sql(a: String, b: String) =
        s"(list_dot_product($a, $a) + list_dot_product($b, $b) - 2 * list_dot_product($a, $b))"
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id < 8),
         |cent AS (SELECT vec_id AS cent_id, cv AS cent_v FROM c WHERE vec_id % 31 = 0),
         |assigned AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT c.vec_id, cent.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosSql("c.cv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM c CROSS JOIN cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cent_id FROM (
         |    SELECT q.query_id, cent.cent_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY ${cosSql("q.qv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM q CROSS JOIN cent)
         |  WHERE rn <= 4),
         |js AS (SELECT unnest(range(8)) AS j),
         |cb AS (
         |  SELECT js.j, vec_id AS code_id, cv[js.j*8+1 : js.j*8+8] AS cb_v
         |  FROM c CROSS JOIN js WHERE vec_id % 41 = 0),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT c.vec_id, cb.j, cb.code_id AS code,
         |           row_number() OVER (PARTITION BY c.vec_id, cb.j
         |             ORDER BY ${d2Sql("c.cv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")},
         |                      cb.code_id) AS rn
         |    FROM c CROSS JOIN cb)
         |  WHERE rn = 1),
         |dt AS (
         |  SELECT q.query_id, cb.j, cb.code_id AS code,
         |         ${d2Sql("q.qv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")} AS dd
         |  FROM q CROSS JOIN cb),
         |cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE p.query_id != a.vec_id),
         |scored AS (
         |  SELECT n.query_id, n.vec_id,
         |         list_reduce(list_prepend(0.0, list(d.dd ORDER BY e.j)),
         |                     (acc, x) -> acc + x) AS adc_d2
         |  FROM cand n
         |  JOIN enc e ON e.vec_id = n.vec_id
         |  JOIN dt d ON d.query_id = n.query_id AND d.j = e.j AND d.code = e.code
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, round(adc_d2, 5) AS adc_d2, rk FROM (
         |  SELECT query_id, vec_id, adc_d2,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY adc_d2, vec_id) AS rk
         |  FROM scored)
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.ProductQuantization
      val emb = t(s, dir, "embeddings")
      val cents = SimilaritySearch.modularCentroids(emb, centroidStep = 31)
      val cb = ProductQuantization.modularCodebooks(emb, m = 8, subDim = 8, step = 41)
      val index = ProductQuantization.buildIvfPqIndex(cents, cb, emb, m = 8, subDim = 8)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      ProductQuantization.probeIvfPq(index, cents, cb, queries,
          k = 5, nProbe = 4, m = 8, subDim = 8)
        .select(col("query_id"), col("vec_id"),
          round(col("adc_d2"), 5).as("adc_d2"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF-PQ **by residual** — the FAISS default: codes quantize
    // v − centroid (far smaller spread than raw vectors at equal
    // codebook budget), codebooks are trained ON the residuals, and the
    // probe builds one distance table per probed (query, centroid) pair
    // against q − centroid. Element-wise subtraction is bit-identical
    // across engines, so even this variant replays exactly.
    Q("q_ann_ivfpq_residual", {
      def d2Sql(a: String, b: String) =
        s"(list_dot_product($a, $a) + list_dot_product($b, $b) - 2 * list_dot_product($a, $b))"
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id < 8),
         |cent AS (SELECT vec_id AS cent_id, cv AS cent_v FROM c WHERE vec_id % 31 = 0),
         |assigned AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT c.vec_id, cent.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosSql("c.cv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM c CROSS JOIN cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cent_id FROM (
         |    SELECT q.query_id, cent.cent_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY ${cosSql("q.qv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM q CROSS JOIN cent)
         |  WHERE rn <= 4),
         |res AS (
         |  SELECT a.vec_id, a.cent_id,
         |         list_transform(range(64), i -> c.cv[i+1] - cent.cent_v[i+1]) AS rv
         |  FROM assigned a JOIN c USING (vec_id)
         |  JOIN cent ON a.cent_id = cent.cent_id),
         |js AS (SELECT unnest(range(8)) AS j),
         |cb AS (
         |  SELECT js.j, vec_id AS code_id, rv[js.j*8+1 : js.j*8+8] AS cb_v
         |  FROM res CROSS JOIN js WHERE vec_id % 41 = 0),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT r.vec_id, cb.j, cb.code_id AS code,
         |           row_number() OVER (PARTITION BY r.vec_id, cb.j
         |             ORDER BY ${d2Sql("r.rv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")},
         |                      cb.code_id) AS rn
         |    FROM res r CROSS JOIN cb)
         |  WHERE rn = 1),
         |qres AS (
         |  SELECT p.query_id, p.cent_id,
         |         list_transform(range(64), i -> q.qv[i+1] - cent.cent_v[i+1]) AS rqv
         |  FROM probes p JOIN q USING (query_id)
         |  JOIN cent ON p.cent_id = cent.cent_id),
         |dt AS (
         |  SELECT r.query_id, r.cent_id, cb.j, cb.code_id AS code,
         |         ${d2Sql("r.rqv[cb.j*8+1 : cb.j*8+8]", "cb.cb_v")} AS dd
         |  FROM qres r CROSS JOIN cb),
         |cand AS (
         |  SELECT p.query_id, a.vec_id, a.cent_id
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE p.query_id != a.vec_id),
         |scored AS (
         |  SELECT n.query_id, n.vec_id,
         |         list_reduce(list_prepend(0.0, list(d.dd ORDER BY e.j)),
         |                     (acc, x) -> acc + x) AS adc_d2
         |  FROM cand n
         |  JOIN enc e ON e.vec_id = n.vec_id
         |  JOIN dt d ON d.query_id = n.query_id AND d.cent_id = n.cent_id
         |            AND d.j = e.j AND d.code = e.code
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, round(adc_d2, 5) AS adc_d2, rk FROM (
         |  SELECT query_id, vec_id, adc_d2,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY adc_d2, vec_id) AS rk
         |  FROM scored)
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      import graft.operators.ProductQuantization
      val emb = t(s, dir, "embeddings")
      val cents = SimilaritySearch.modularCentroids(emb, centroidStep = 31)
      // codebooks trained on the residuals themselves (modular sample of
      // them — the oracle-expressible stand-in for residual k-means)
      val resid = SimilaritySearch.buildIvfIndex(cents, emb)
        .join(broadcast(cents.select(col("cent_id"), col("cent_v"))), "cent_id")
        .select(col("vec_id"),
          zip_with(col("_cv"), col("cent_v"), (a, b) => a - b).as("embedding"))
      val cb = ProductQuantization.modularCodebooks(resid, m = 8, subDim = 8, step = 41)
      val index = ProductQuantization.buildIvfPqIndex(cents, cb, emb,
        m = 8, subDim = 8, byResidual = true)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      ProductQuantization.probeIvfPq(index, cents, cb, queries,
          k = 5, nProbe = 4, m = 8, subDim = 8, byResidual = true)
        .select(col("query_id"), col("vec_id"),
          round(col("adc_d2"), 5).as("adc_d2"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    },

    // Brute-force exact cosine top-k (query side broadcast; corpus
    // streams once, per-group window limit keeps k rows pre-shuffle).
    Q("q_ann_brute_topk", {
      val cos = cosSql("q.qv", "c.cv")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id < 8),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |pairs AS (
         |  SELECT q.query_id, c.vec_id, $cos AS cosine
         |  FROM q CROSS JOIN c WHERE q.query_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cosine,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, vec_id) AS rk
         |  FROM pairs)
         |SELECT query_id, vec_id, round(cosine, 5) AS cosine, rk
         |FROM ranked WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      SimilaritySearch.bruteForceTopK(queries, emb, k = 5)
        .withColumn("cosine", round(col("cosine"), 5))
        .orderBy(col("query_id"), col("rk"))
    },

    // kNN label-agreement audit, EXACT brute-force backend — kept as
    // the calibration oracle beside the IVF-primary q_ml_label_agreement
    // below (corpus × corpus cosine: audit scale only; diffing the two
    // avg_match columns is the built-in agreement-delta monitor).
    Q("q_ml_label_agreement_brute", {
      val cos = cosSql("q.qv", "c.cv")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
         |           FROM embeddings),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
         |pairs AS (
         |  SELECT q.query_id, q.ql, c.vec_id, c.cl, $cos AS cosine
         |  FROM q CROSS JOIN c WHERE q.query_id != c.vec_id),
         |ranked AS (
         |  SELECT query_id, ql, cl,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, vec_id) AS rk
         |  FROM pairs),
         |m AS (SELECT query_id, ql,
         |             cast(sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS bigint) AS matches
         |      FROM ranked WHERE rk <= 5 GROUP BY query_id, ql)
         |SELECT ql AS label, cast(count(*) AS bigint) AS n,
         |       round(avg(matches), 6) AS avg_match,
         |       cast(count(*) FILTER (WHERE matches * 2 < 5) AS bigint) AS n_suspect
         |FROM m GROUP BY 1 ORDER BY label""".stripMargin
    }) { (s, dir) =>
      graft.operators.LabelAgreement.perLabel(t(s, dir, "embeddings"), k = 5)
    },

    // kNN label-agreement audit (label-noise detection): per embedding,
    // how many of its 5 cosine-nearest neighbors share its label,
    // rolled up per label with a strict-minority suspect count — the
    // confident-learning QA gate, all-integer until the final mean.
    // PRIMARY backend = IVF (perLabelFrom, the corpus-scale plug):
    // deterministic modular centroids, 4-probe search, so the
    // approximate neighbor set — and therefore the whole agreement
    // rollup — replays exactly in the oracle; probes are NOT broadcast
    // (queries = the corpus). Brute-force cosine is the wrong default
    // at 100× scale; it stays above as the calibration oracle.
    Q("q_ml_label_agreement", {
      val cosAssign = cosSql("c.cv", "cent.cent_v")
      val cosProbe = cosSql("q.qv", "cent.cent_v")
      val cosScore = cosSql("p.qv", "a.cv")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
         |      FROM embeddings),
         |cent AS (SELECT vec_id AS cent_id, cv AS cent_v FROM c WHERE vec_id % 31 = 0),
         |assigned AS (
         |  SELECT vec_id, cv, cent_id FROM (
         |    SELECT c.vec_id, c.cv, cent.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY $cosAssign DESC, cent.cent_id) AS rn
         |    FROM c CROSS JOIN cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, ql, cent_id FROM (
         |    SELECT q.query_id, q.qv, q.ql, cent.cent_id,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY $cosProbe DESC, cent.cent_id) AS rn
         |    FROM q CROSS JOIN cent)
         |  WHERE rn <= 4),
         |scored AS (
         |  SELECT p.query_id, p.ql, a.vec_id, $cosScore AS cosine
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE p.query_id != a.vec_id),
         |ivf AS (
         |  SELECT query_id, ql, vec_id FROM (
         |    SELECT query_id, ql, vec_id,
         |           row_number() OVER (PARTITION BY query_id
         |                              ORDER BY cosine DESC, vec_id) AS rk
         |    FROM scored)
         |  WHERE rk <= 5),
         |nl AS (SELECT vec_id, label AS nlbl FROM embeddings),
         |m AS (SELECT i.query_id, i.ql,
         |             cast(sum(CASE WHEN nl.nlbl = i.ql THEN 1 ELSE 0 END) AS bigint) AS matches
         |      FROM ivf i JOIN nl ON i.vec_id = nl.vec_id GROUP BY 1, 2)
         |SELECT ql AS label, cast(count(*) AS bigint) AS n,
         |       round(avg(matches), 6) AS avg_match,
         |       cast(count(*) FILTER (WHERE matches * 2 < 5) AS bigint) AS n_suspect
         |FROM m GROUP BY 1 ORDER BY label""".stripMargin
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val nn = SimilaritySearch.ivfTopK(queries, emb, k = 5,
        centroidStep = 31, nProbe = 4, broadcastProbes = false)
      graft.operators.LabelAgreement.perLabelFrom(nn, emb, k = 5)
    },

    // IVF-bucketed ANN. Approximate by design (recall < 1), but fully
    // DETERMINISTIC: centroids are a modular-arithmetic selection and the
    // two-stage plan is plain relational algebra, so the whole query is
    // mirrored in the oracle and hash-checked (round 2's rows-only gap).
    Q("q_ann_ivf_topk", ivfSql(final_ = "topk")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      SimilaritySearch.ivfTopK(queries, emb, k = 5, centroidStep = 31, nProbe = 4)
        .withColumn("cosine", round(col("cosine"), 5))
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF against a STORED index — the serving shape at corpus scale:
    // the assignment pass runs once and lands as a parquet table
    // partitioned by cent_id; the query batch probes the READ-BACK index,
    // and the broadcast probe join prunes unprobed partitions at the
    // directory level (dynamic partition pruning — asserted in PlanSpec).
    // Same parameters as q_ann_ivf_topk, so the identical oracle proves
    // the store → read → probe round trip is lossless (double arrays are
    // bit-exact through parquet).
    Q("q_ann_ivf_stored", ivfSql(final_ = "topk")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cents = SimilaritySearch.modularCentroids(emb, centroidStep = 31)
      val idxPath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfidx_${Integer.toHexString(dir.hashCode)}"
      val built = SimilaritySearch.buildIvfIndex(cents, emb)
      built.write.mode("overwrite").partitionBy("cent_id").parquet(idxPath)
      // read back with the WRITTEN schema: partition-column type
      // inference would otherwise downcast cent_id to int, and the
      // resulting cast on the partition attribute defeats dynamic
      // partition pruning in the probe join
      val index = s.read.schema(built.schema).parquet(idxPath)
      SimilaritySearch.probeIvfIndex(index, cents, queries, k = 5, nProbe = 4)
        .withColumn("cosine", round(col("cosine"), 5))
        .orderBy(col("query_id"), col("rk"))
    },

    // IVF recall@k against the exact brute-force top-k on the same
    // queries — both sides now oracle-checked end to end (also
    // floor-asserted in SimilaritySearchSpec).
    Q("q_ann_ivf_recall", ivfSql(final_ = "recall")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val brute = SimilaritySearch.bruteForceTopK(queries, emb, k = 5)
        .select(col("query_id"), col("vec_id"))
      val ivf = SimilaritySearch.ivfTopK(queries, emb, k = 5, centroidStep = 31, nProbe = 4)
        .select(col("query_id"), col("vec_id"), lit(1L).as("_hit"))
      // single evaluation of each side: outer-join indicator + one agg
      // (an agg + semi-join pair would recompute both subtrees)
      brute.join(ivf, Seq("query_id", "vec_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_recalled"))
        .withColumn("recall_at_5", round(col("n_recalled") / col("n_exact"), 4))
    },

    // IVF nprobe tuning sweep: recall@5 at nprobe ∈ {1, 2, 4} in one
    // result — the table a user reads to pick the recall/cost point.
    Q("q_ann_ivf_sweep", ivfSql(final_ = "sweep")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      // tiny (|Q|·k rows) but feeds all three sweep branches
      val brute = SimilaritySearch.bruteForceTopK(queries, emb, k = 5)
        .select(col("query_id"), col("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Seq(1, 2, 4).map { np =>
        val ivf = SimilaritySearch.ivfTopK(queries, emb, k = 5, centroidStep = 31, nProbe = np)
          .select(col("query_id"), col("vec_id"), lit(1L).as("_hit"))
        brute.join(ivf, Seq("query_id", "vec_id"), "left_outer")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("_hit"), lit(0L))).as("n_recalled"))
          .select(lit(np).as("nprobe"), col("n_exact"), col("n_recalled"),
            round(col("n_recalled") / col("n_exact"), 4).as("recall_at_5"))
      }.reduce(_ unionByName _).orderBy(col("nprobe"))
    },

    // IVF with PRODUCTION centroids — MLlib KMeans fit on the embedding
    // column, searched through the identical ivfTopKFrom plan as the
    // oracle-checked modulo variant. Training is iterative/seeded (not
    // SQL-expressible) → rows-only; the emitted recall row vs the exact
    // brute-force top-k is the correctness signal.
    Q.rowsOnly("q_ann_ivf_kmeans_recall") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cents = SimilaritySearch.kmeansCentroids(emb, kCentroids = 16, seed = 42L)
        .persist()
      val brute = SimilaritySearch.bruteForceTopK(queries, emb, k = 5)
        .select(col("query_id"), col("vec_id"))
      val ivf = SimilaritySearch.ivfTopKFrom(cents, queries, emb, k = 5, nProbe = 4)
        .select(col("query_id"), col("vec_id"), lit(1L).as("_hit"))
      brute.join(ivf, Seq("query_id", "vec_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_recalled"))
        .withColumn("recall_at_5", round(col("n_recalled") / col("n_exact"), 4))
    },

    // Embedding near-duplicate pairs via multi-table hyperplane LSH.
    // The hash planes are deterministic Scala-side double literals, so
    // the oracle embeds the IDENTICAL literals and replays the bucketing
    // + candidate join + cosine scoring exactly — hash-checked despite
    // being an "approximate" operator (round 2's rows-only gap). Recall
    // vs brute force additionally floor-asserted in DedupSpec.
    Q("q_embed_neardup", neardupSql) { (s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), dim = 64,
          cosThreshold = 0.35, nBits = 4, nTables = 8)
        .withColumn("cosine", round(col("cosine"), 5))
        .orderBy(col("id_a"), col("id_b"))
    },

    // X60 semantic dedup (SemDeDup): cluster-then-compare — pairs are
    // generated ONLY intra-cluster. Centroids here are the
    // oracle-expressible modular rule (vec_id ≡ 0 mod 31, same plan
    // shape as the k-means fit), so DuckDB replays assignment + the
    // intra-cluster brute-force pairing + threshold exactly.
    Q("q_dedup_semantic", {
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         |cent AS (SELECT vec_id AS cent_id, cv AS cent_v FROM c WHERE vec_id % 31 = 0),
         |assigned AS (
         |  SELECT vec_id, cv, cent_id FROM (
         |    SELECT c.vec_id, c.cv, cent.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosSql("c.cv", "cent.cent_v")} DESC, cent.cent_id) AS rn
         |    FROM c CROSS JOIN cent)
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.cv", "b.cv")} AS cosine
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(cosine, 5) AS cosine
         |FROM pairs WHERE cosine >= 0.35
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Dedup.semanticNearDupPairs(emb,
          SimilaritySearch.modularCentroids(emb, centroidStep = 31), cosThreshold = 0.35)
        .withColumn("cosine", round(col("cosine"), 5))
        .orderBy(col("id_a"), col("id_b"))
    },

    // X60 recall monitor: the production path (k-means centroids, k =
    // the corpus's 10 latent classes) vs FULL brute-force pairs at the
    // same threshold. Precision is 1 by construction (every emitted
    // pair is exact-cosine-scored); recall is what clustering trades —
    // floor-asserted in DedupSpec, monitored here at bench scale.
    Q.rowsOnly("q_dedup_semantic_recall") { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val cents = SimilaritySearch.kmeansCentroids(emb, kCentroids = 10, seed = 42L)
      // eager localCheckpoint, not persist: the result is returned LAZY,
      // so a finally-unpersist would run before the harness executes it
      // and the self-join would recompute this subtree twice
      val vecs = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("v"))
        .withColumn("n", graft.functions.VectorFunctions.norm(col("v")))
        .localCheckpoint(true)
      val brute = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cosine",
          when(col("a.n") * col("b.n") === 0.0, lit(0.0))
            .otherwise(graft.functions.VectorFunctions.dot(col("a.v"), col("b.v"))
              / (col("a.n") * col("b.n"))))
        .filter(col("cosine") >= 0.35)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      // soft assignment (2 nearest clusters): boundary pairs are caught
      // when any cluster is shared — the recall dial of the operator
      val sem = Dedup.semanticNearDupPairs(emb, cents, cosThreshold = 0.35, nAssign = 2)
        .select(col("id_a"), col("id_b"), lit(1L).as("_hit"))
      brute.join(sem, Seq("id_a", "id_b"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_recalled"))
        .withColumn("recall", round(col("n_recalled") / col("n_exact"), 4))
    },

    // M10 threshold-metrics curve over a deterministic pseudo-score.
    Q("q_ml_threshold_metrics",
      """WITH scored AS (
        |  SELECT ((vec_id * 37) % 97) / 96.0 AS prob, label FROM embeddings),
        |bucketed AS (
        |  SELECT greatest(least(cast(floor(prob * 20) AS int), 19), 0) AS bucket,
        |         cast(label AS int) AS label, count(*) AS n
        |  FROM scored GROUP BY 1, 2),
        |domain AS (
        |  SELECT d.bucket, l.label
        |  FROM (SELECT cast(range AS int) AS bucket FROM range(0, 20)) d
        |  CROSS JOIN (SELECT 0 AS label UNION ALL SELECT 1) l),
        |full_grid AS (
        |  SELECT d.bucket, d.label, coalesce(b.n, 0) AS n
        |  FROM domain d LEFT JOIN bucketed b
        |    ON d.bucket = b.bucket AND d.label = b.label),
        |cum AS (
        |  SELECT bucket, label, n,
        |         coalesce(sum(n) OVER (PARTITION BY label ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_below,
        |         sum(n) OVER (PARTITION BY label ORDER BY bucket
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_at_or_above
        |  FROM full_grid),
        |curve AS (
        |  SELECT bucket,
        |         cast(sum(CASE WHEN label = 1 THEN n_at_or_above END) AS bigint) AS tp,
        |         cast(sum(CASE WHEN label = 0 THEN n_at_or_above END) AS bigint) AS fp,
        |         cast(sum(CASE WHEN label = 0 THEN n_below END) AS bigint) AS tn,
        |         cast(sum(CASE WHEN label = 1 THEN n_below END) AS bigint) AS fn
        |  FROM cum GROUP BY bucket)
        |SELECT bucket, tp, fp, tn, fn,
        |       cast(bucket AS double) / 20 AS threshold,
        |       CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS precision,
        |       CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS recall,
        |       CASE WHEN fp + tn = 0 THEN 0.0 ELSE fp / (fp + tn) END AS fpr,
        |       (tp + tn) / (tp + fp + tn + fn) AS accuracy,
        |       CASE WHEN (CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END)
        |               + (CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END) = 0 THEN 0.0
        |            ELSE 2 * (CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END)
        |                   * (CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END)
        |                 / ((CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END)
        |                    + (CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END)) END AS f1
        |FROM curve ORDER BY bucket""".stripMargin) { (s, dir) =>
      val scored = t(s, dir, "embeddings")
        .select((((col("vec_id") * 37) % 97) / 96.0).as("prob"), col("label"))
      ThresholdMetrics.compute(scored, nBuckets = 20, probCol = "prob")
        .orderBy(col("bucket"))
    },

    // M10/M12 the reference's ARTIFACT shape (results/brf/metrics.csv,
    // random_forest.py:136-220): upper-edge thresholds (b+1)/n over the
    // -1..n-1 domain, floor WITHOUT clamp (the pseudo-score hits
    // prob == 1.0, exercising the overflow bucket), unguarded precision
    // (null on both engines at an empty positive set), and the four
    // count-over-total percentage columns. ResultsParitySpec pins the
    // same frame column-for-column against the committed reference CSV.
    // (label is the 10-class corpus label, binarized by parity — the
    // reference's predictions carry a true binary label; the curve's
    // percentage columns only partition 1 over a binary label.)
    Q("q_ml_threshold_reference",
      """WITH scored AS (
        |  SELECT ((vec_id * 37) % 97) / 96.0 AS prob,
        |         cast(label % 2 AS int) AS label
        |  FROM embeddings),
        |tot AS (SELECT cast(count(*) AS double) AS total FROM scored),
        |bucketed AS (
        |  SELECT label, cast(floor(prob * 20) AS bigint) AS id_bucket, count(*) AS n
        |  FROM scored GROUP BY 1, 2),
        |domain AS (
        |  SELECT cast(range AS bigint) AS id_bucket, l.label
        |  FROM range(-1, 20) CROSS JOIN (SELECT 0 AS label UNION ALL SELECT 1) l),
        |grid AS (
        |  SELECT coalesce(d.id_bucket, b.id_bucket) AS id_bucket,
        |         coalesce(d.label, b.label) AS label,
        |         coalesce(b.n, 0) AS n
        |  FROM domain d FULL JOIN bucketed b
        |    ON d.id_bucket = b.id_bucket AND d.label = b.label),
        |cum AS (
        |  SELECT id_bucket, label,
        |         sum(n) OVER (PARTITION BY label ORDER BY id_bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_neg,
        |         coalesce(sum(n) OVER (PARTITION BY label ORDER BY id_bucket
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_pos
        |  FROM grid),
        |curve AS (
        |  SELECT id_bucket,
        |         cast(coalesce(sum(CASE WHEN label = 0 THEN n_neg END), 0) AS double) AS tn,
        |         cast(coalesce(sum(CASE WHEN label = 0 THEN n_pos END), 0) AS double) AS fp,
        |         cast(coalesce(sum(CASE WHEN label = 1 THEN n_neg END), 0) AS double) AS fn,
        |         cast(coalesce(sum(CASE WHEN label = 1 THEN n_pos END), 0) AS double) AS tp
        |  FROM cum GROUP BY 1)
        |SELECT cast(id_bucket + 1 AS double) / 20 AS threshold,
        |       tp / (tp + fp) AS precision,
        |       CASE WHEN tp <> 0 THEN tp / (tp + fn) ELSE 0.0 END AS recall,
        |       fp / (fp + tn) AS fpr,
        |       (tp + tn) / (tp + tn + fp + fn) AS accuracy,
        |       2 * (tp / (tp + fp))
        |         * (CASE WHEN tp <> 0 THEN tp / (tp + fn) ELSE 0.0 END)
        |         / ((tp / (tp + fp))
        |            + (CASE WHEN tp <> 0 THEN tp / (tp + fn) ELSE 0.0 END)) AS f1,
        |       tn / total AS tn_pct, tp / total AS tp_pct,
        |       fn / total AS fn_pct, fp / total AS fp_pct
        |FROM curve CROSS JOIN tot
        |ORDER BY threshold""".stripMargin) { (s, dir) =>
      val scored = t(s, dir, "embeddings")
        .select((((col("vec_id") * 37) % 97) / 96.0).as("prob"),
          (col("label") % 2).as("label"))
      ThresholdMetrics.referenceCurve(scored, nPoints = 20, probCol = "prob")
        .select(col("Threshold").as("threshold"),
          col("Precision").as("precision"),
          col("Recall").as("recall"),
          col("False positive rate").as("fpr"),
          col("Accuracy").as("accuracy"),
          col("F1 Score").as("f1"),
          col("True negative percentage").as("tn_pct"),
          col("True positive percentage").as("tp_pct"),
          col("False negative percentage").as("fn_pct"),
          col("False positive percentage").as("fp_pct"))
        .orderBy(col("threshold"))
    },

    // M8 baseline rate model fit as ONE aggregation + reverse-cumulative
    // window (the reference runs 377 sequential filter+count jobs —
    // mains/main_train_base.py:25-51).
    Q("q_ml_baseline_rate",
      """WITH labeled AS (
        |  SELECT o.o_orderkey,
        |         CASE WHEN o.o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label,
        |         c.cnt
        |  FROM orders o JOIN (SELECT l_orderkey, count(*) AS cnt
        |                      FROM lineitem GROUP BY 1) c
        |    ON o.o_orderkey = c.l_orderkey),
        |by_count AS (
        |  SELECT cast(cnt AS bigint) AS count_value,
        |         count(*) AS n,
        |         cast(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS bigint) AS n_pos
        |  FROM labeled GROUP BY 1)
        |SELECT count_value, n, n_pos,
        |       cast(sum(n) OVER w AS bigint) AS cum_n,
        |       cast(sum(n_pos) OVER w AS bigint) AS cum_pos,
        |       cast(sum(n_pos) OVER w AS double) / cast(sum(n) OVER w AS double) AS prob
        |FROM by_count
        |WINDOW w AS (ORDER BY count_value DESC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY count_value""".stripMargin) { (s, dir) =>
      val cnt = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      val labeled = t(s, dir, "orders")
        .join(cnt, col("o_orderkey") === col("l_orderkey"))
        .select(when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"),
          col("cnt"))
      BaselineRateModel.fit(labeled, countCol = "cnt", labelCol = "label")
        .withColumn("prob", col("cum_pos").cast("double") / col("cum_n").cast("double"))
        .orderBy(col("count_value"))
    },

    // M3 class weighting (when-chain projection, no shuffle).
    Q("q_ml_class_weights",
      """SELECT cast(label AS int) AS label,
        |       cast(CASE WHEN cast(label AS int) = 1 THEN 1.75 ELSE 0.25 END AS double) AS weight,
        |       count(*) AS n_rows
        |FROM embeddings GROUP BY 1, 2 ORDER BY label""".stripMargin) { (s, dir) =>
      val weighted = new ClassWeighter()
        .setLabelCol("label").setWeightCol("weight")
        .setClassWeights(Array(0.25, 1.75))
        .transform(t(s, dir, "embeddings"))
      weighted
        .groupBy(col("label").cast("int").as("label"), col("weight"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("label"))
    },

    // Embedding-space drift monitor: per-label centroid cosine + norm
    // ratio vs the corpus centroid. 2^20 fixed-point quantization makes
    // every corpus-sized sum an exact integer aggregate; only the final
    // 64-element centroid folds run in (dimension-ordered) float.
    Q("q_embed_centroid_drift",
      """WITH e AS (
        |  SELECT vec_id, label, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS d
        |  FROM embeddings),
        |qq AS (SELECT label, d, cast(floor(cast(v AS double) * 1048576) AS bigint) AS q
        |       FROM e),
        |g AS (SELECT label, d, cast(sum(q) AS bigint) AS s FROM qq GROUP BY 1, 2),
        |c AS (SELECT d, cast(sum(s) AS bigint) AS sc FROM g GROUP BY 1),
        |ng AS (SELECT label, cast(count(*) AS bigint) AS n FROM embeddings GROUP BY 1),
        |n2c AS (SELECT list_reduce(list_prepend(0.0,
        |          list(cast(sc AS double) * cast(sc AS double) ORDER BY d)),
        |          (a, x) -> a + x) AS n2 FROM c),
        |gg AS (
        |  SELECT g.label,
        |         list_reduce(list_prepend(0.0,
        |           list(cast(g.s AS double) * cast(c.sc AS double) ORDER BY g.d)),
        |           (a, x) -> a + x) AS dot,
        |         list_reduce(list_prepend(0.0,
        |           list(cast(g.s AS double) * cast(g.s AS double) ORDER BY g.d)),
        |           (a, x) -> a + x) AS n2g
        |  FROM g JOIN c USING (d) GROUP BY g.label)
        |SELECT gg.label, cast(ng.n AS int) AS n_vecs,
        |       round(dot / (sqrt(n2g) * sqrt(n2c.n2)), 6) AS cos_to_corpus,
        |       round((cast((SELECT sum(n) FROM ng) AS double) / ng.n)
        |             * sqrt(n2g) / sqrt(n2c.n2), 6) AS norm_ratio
        |FROM gg JOIN ng USING (label) CROSS JOIN n2c
        |ORDER BY label""".stripMargin) { (s, dir) =>
      graft.operators.EmbeddingDrift.groupCentroidDrift(t(s, dir, "embeddings"))
        .orderBy(col("label"))
    },

    // MMR diversity re-ranking of a dense top-8 shortlist (λ=0.7,
    // pick 4). The greedy recurrence is unrolled step by step in BOTH
    // engines, so every pick — including the redundancy max — is
    // hash-checked, not just the final set.
    Q("q_embed_mmr", mmrSql(shortN = 8, k = 4)) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val short = SimilaritySearch.bruteForceTopK(queries, emb, k = 8)
      val cands = short
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("query_id"), col("vec_id").as("doc_id"),
          col("cosine").as("rel"), col("embedding").as("cv"))
      MmrRerank.rerank(cands, k = 4, lambda = 0.7)
        .select(col("query_id"), col("doc_id"),
          round(col("score"), 6).as("mmr"), col("step"))
        .orderBy(col("query_id"), col("step"))
    },

    // X117 retrieval-quality evaluation: NDCG@10 + MRR of the exact
    // cosine top-10 with same-label binary relevance. Discounts and
    // reciprocal ranks are fixed integer-micro literal tables (stated
    // verbatim in the oracle), so every per-query score and the corpus
    // means are summation-order-free — see operators/RankingMetrics.
    Q("q_ml_ranking_quality", {
      val cos = cosSql("q.qv", "c.cv")
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label AS cl FROM embeddings),
         |pairs AS (SELECT q.query_id, q.ql, c.vec_id, c.cl, $cos AS cosine
         |          FROM q CROSS JOIN c WHERE q.query_id != c.vec_id),
         |ranked AS (SELECT query_id, ql, cl,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cosine DESC, vec_id) AS rk
         |           FROM pairs),
         |top AS (SELECT query_id, rk, CASE WHEN cl = ql THEN 1 ELSE 0 END AS rel
         |        FROM ranked WHERE rk <= 10),
         |wdcg(rk, w) AS (VALUES (1, 1000000), (2, 630930), (3, 500000), (4, 430677),
         |  (5, 386853), (6, 356207), (7, 333333), (8, 315465), (9, 301030), (10, 289065)),
         |widcg(r, w) AS (VALUES (1, 1000000), (2, 1630930), (3, 2130930), (4, 2561607),
         |  (5, 2948460), (6, 3304667), (7, 3638000), (8, 3953465), (9, 4254495), (10, 4543560)),
         |wmrr(rk, w) AS (VALUES (1, 1000000), (2, 500000), (3, 333333), (4, 250000),
         |  (5, 200000), (6, 166667), (7, 142857), (8, 125000), (9, 111111), (10, 100000)),
         |perq AS (SELECT t.query_id,
         |                sum(CASE WHEN t.rel = 1 THEN d.w ELSE 0 END) AS dcg_us,
         |                sum(t.rel) AS n_rel,
         |                min(CASE WHEN t.rel = 1 THEN t.rk END) AS first_rel
         |         FROM top t JOIN wdcg d ON d.rk = t.rk GROUP BY 1),
         |scored AS (SELECT
         |    CASE WHEN n_rel = 0 THEN 0
         |         ELSE cast(round(dcg_us * 1000000
         |                / (SELECT w FROM widcg WHERE r = n_rel)) AS bigint) END AS ndcg_ppm,
         |    CASE WHEN first_rel IS NULL THEN 0
         |         ELSE (SELECT w FROM wmrr WHERE rk = first_rel) END AS mrr_us,
         |    CASE WHEN n_rel = 0 THEN 1 ELSE 0 END AS zero
         |  FROM perq)
         |SELECT cast(count(*) AS bigint) AS n_queries,
         |       round(cast(sum(ndcg_ppm) AS double) / count(*) / 1000000.0, 6) AS mean_ndcg,
         |       round(cast(sum(mrr_us) AS double) / count(*) / 1000000.0, 6) AS mean_mrr,
         |       cast(sum(zero) AS bigint) AS n_zero
         |FROM scored""".stripMargin
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val queries = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val qLabels = q.select(col("vec_id").as("query_id"), col("label").as("ql"))
      val rel = SimilaritySearch.bruteForceTopK(queries, emb, k = 10)
        .join(emb.select(col("vec_id"), col("label").as("cl")), Seq("vec_id"))
        .join(broadcast(qLabels), Seq("query_id"))
        .withColumn("rel", (col("cl") === col("ql")).cast("long"))
      graft.operators.RankingMetrics.ndcgMrr(rel,
        queryId = "query_id", rankCol = "rk", relCol = "rel")
    })

  /** Oracle for [[MmrRerank]]: the greedy selection unrolled as one CTE
    * chain per step, mirroring the operator's dataframe stages.
    */
  private def mmrSql(shortN: Int, k: Int): String = {
    val steps = (2 to k).map { s =>
      val prev = s"sel${s - 1}"
      s""",
         |pick$s AS (
         |  SELECT query_id, doc_id, score FROM (
         |    SELECT c.query_id, c.doc_id,
         |           0.7*c.rel - 0.3*max(p.sim) AS score,
         |           row_number() OVER (PARTITION BY c.query_id
         |                              ORDER BY 0.7*c.rel - 0.3*max(p.sim) DESC, c.doc_id) AS rn
         |    FROM cands c
         |    JOIN $prev sl ON c.query_id = sl.query_id
         |    JOIN pairs p ON p.query_id = c.query_id AND p.a = c.doc_id AND p.b = sl.doc_id
         |    WHERE c.doc_id NOT IN (SELECT doc_id FROM $prev x WHERE x.query_id = c.query_id)
         |    GROUP BY c.query_id, c.doc_id, c.rel)
         |  WHERE rn = 1),
         |sel$s AS (SELECT query_id, doc_id, score, step FROM sel${s - 1}
         |          UNION ALL SELECT query_id, doc_id, score, $s AS step FROM pick$s)""".stripMargin
    }.mkString
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 3),
       |c0 AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |cands AS (
       |  SELECT query_id, doc_id, rel, cv FROM (
       |    SELECT q.query_id, c0.vec_id AS doc_id, ${cosSql("q.qv", "c0.cv")} AS rel, c0.cv,
       |           row_number() OVER (PARTITION BY q.query_id
       |                              ORDER BY ${cosSql("q.qv", "c0.cv")} DESC, c0.vec_id) AS rn
       |    FROM q CROSS JOIN c0 WHERE q.query_id != c0.vec_id) WHERE rn <= $shortN),
       |pairs AS (
       |  SELECT x.query_id, x.doc_id AS a, y.doc_id AS b, ${cosSql("x.cv", "y.cv")} AS sim
       |  FROM cands x JOIN cands y ON x.query_id = y.query_id AND x.doc_id != y.doc_id),
       |sel1 AS (
       |  SELECT query_id, doc_id, 0.7*rel AS score, 1 AS step FROM (
       |    SELECT query_id, doc_id, rel,
       |           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
       |    FROM cands) WHERE rn = 1)$steps
       |SELECT query_id, doc_id, round(score, 6) AS mmr, step
       |FROM sel$k ORDER BY query_id, step""".stripMargin
  }
}
