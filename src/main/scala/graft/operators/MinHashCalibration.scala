package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash estimation-error calibration: for every LSH candidate pair,
  * compare the sketch's Jaccard estimate (matching signature
  * components / k) against the EXACT shingle Jaccard, rolled up per
  * match-count level — the audit that tells you whether k signature
  * components are enough for your threshold, or the banding is letting
  * garbage through (high estimate, near-zero true similarity). Run it
  * on a sample before trusting the sketch on the full corpus.
  *
  * Exactness: the estimate is the integer match count, the true
  * Jaccard is fixed-pointed by integer division (n_common·10⁶ div
  * union), and every mean is an exact long sum closed by one division
  * — the whole calibration table hash-replays.
  *
  * Scale shape: both inputs reuse the bounded [[Dedup]] machinery
  * (banded LSH join, df-capped shingle intersection); the audit adds
  * one pair-level join and a ≤ k+1 row rollup.
  */
object MinHashCalibration {

  /** (match_cnt, n_pairs, mean_est r6, mean_exact r6, mean_abs_err r6)
    * per signature-match level over the LSH candidate set; candidates
    * with no shared (df-capped) shingle count as exact Jaccard 0.
    */
  def errorByEstimate(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
      idCol: String = "doc_id", textCol: String = "text", seed: Long = 42L,
      oracleHashes: Boolean = false): DataFrame = {
    val k = bands * rowsPerBand
    val est = Dedup.minHashLshPairs(docs, n, bands, rowsPerBand,
        estThreshold = 0.0, idCol, textCol, maxBucketSize = 1000, seed, oracleHashes)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard") * k).cast("long").as("match_cnt"))
    val exact = Dedup.ngramJaccardPairs(docs, n, threshold = 0.0, idCol, textCol)
      .select(col("id_a"), col("id_b"),
        expr("n_common * 1000000L div (n_a + n_b - n_common)").as("exact_ppm"))
    est.join(exact, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("exact_ppm"))
      .withColumn("est_ppm", expr(s"match_cnt * 1000000L div $k"))
      .groupBy(col("match_cnt"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("est_ppm")).as("_se"),
        sum(col("exact_ppm")).as("_sx"),
        sum(abs(col("est_ppm") - col("exact_ppm"))).as("_sd"))
      .select(col("match_cnt"), col("n_pairs"),
        round(col("_se").cast("double") / col("n_pairs") / 1e6, 6).as("mean_est"),
        round(col("_sx").cast("double") / col("n_pairs") / 1e6, 6).as("mean_exact"),
        round(col("_sd").cast("double") / col("n_pairs") / 1e6, 6).as("mean_abs_err"))
      .orderBy(col("match_cnt"))
  }
}
