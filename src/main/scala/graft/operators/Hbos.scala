package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HBOS — histogram-based outlier score (Goldstein & Dengel 2012): per
  * feature, an equi-width histogram over the observed [min, max]; a
  * row's outlier score multiplies, across features, the ratio of the
  * feature's TALLEST bin to the row's own bin (the paper's
  * Σ log(1/density) with max-height-1 normalization, kept in PRODUCT
  * form so the arithmetic is IEEE division/multiplication only —
  * bit-deterministic across engines, which log10 is not). Monotone
  * identical to the paper's score; the multivariate sibling of the
  * univariate [[RobustOutliers]]: a row can sit inside every marginal
  * whisker yet land in rare bins of several features at once.
  *
  * Scale shape (100 TB): ONE min/max aggregate over all features, ONE
  * melted map-side-combined groupBy whose output is ≤ features×bins
  * rows, then one BROADCAST join per feature — the fact table is never
  * shuffled; scoring is entirely map-side, codegen'd.
  */
object Hbos {

  /** Input plus (per feature) `bin_<f>` and the `hbos` score (higher =
    * more anomalous; 1.0 = every feature in its modal bin). Features
    * are cast to double; a constant feature contributes factor 1. Rows
    * with ANY null feature are dropped — a null has no histogram
    * density; callers impute first if they want them scored.
    */
  def score(df: DataFrame, features: Seq[String], nBins: Int = 20): DataFrame = {
    require(features.nonEmpty, "Hbos.score: need at least one feature")
    require(nBins >= 2, s"Hbos.score: nBins=$nBins must be >= 2")
    val clean = df.na.drop(features)
    // one pass: min and max of every feature together
    val aggs = features.flatMap(f =>
      Seq(min(col(f).cast("double")).as(s"_mn_$f"), max(col(f).cast("double")).as(s"_mx_$f")))
    val mmRow = clean.agg(aggs.head, aggs.tail: _*).head()
    val ranges = features.map { f =>
      f -> (mmRow.getAs[Double](s"_mn_$f"), mmRow.getAs[Double](s"_mx_$f"))
    }.toMap

    def binOf(f: String): Column = {
      val (mn, mx) = ranges(f)
      if (mx == mn) lit(0)
      else least(greatest(
        floor((col(f).cast("double") - mn) / (mx - mn) * nBins).cast("int"),
        lit(0)), lit(nBins - 1))
    }
    val binned = features.foldLeft(clean)((acc, f) => acc.withColumn(s"bin_$f", binOf(f)))

    // melted counts: ONE shuffle, <= features x nBins output rows.
    // Eager localCheckpoint, not persist: each per-feature broadcast
    // below re-evaluates its (filtered) input, so without pinning, the
    // full histogram aggregate would rerun once per feature — and a
    // persist() here would sit in the CacheManager for the session
    // (nothing can unpersist it after return). Checkpoint blocks are
    // RDD-level and GC-released once the result frame is dropped.
    val counts = binned.select(explode(array(features.map(f =>
        struct(lit(f).as("_feat"), col(s"bin_$f").as("_bin"))): _*)).as("_fb"))
      .groupBy(col("_fb._feat").as("_feat"), col("_fb._bin").as("_bin"))
      .agg(count(lit(1)).as("_cnt"))
      .localCheckpoint(true)
    val maxes = counts.groupBy(col("_feat")).agg(max(col("_cnt")).as("_maxcnt"))
    val lookup = broadcast(counts.join(maxes, "_feat"))

    // one broadcast join per feature; the fact side never shuffles
    val joined = features.foldLeft(binned) { (acc, f) =>
      acc.join(lookup.filter(col("_feat") === f)
          .select(col("_bin").as(s"bin_$f"),
            col("_cnt").as(s"_c_$f"), col("_maxcnt").as(s"_m_$f")),
        Seq(s"bin_$f"))
    }
    val factor = (f: String) =>
      col(s"_m_$f").cast("double") / col(s"_c_$f").cast("double")
    joined
      .withColumn("hbos", features.map(factor).reduce(_ * _))
      .drop(features.flatMap(f => Seq(s"_c_$f", s"_m_$f")): _*)
  }

  /** Top-k most anomalous rows: (keyCols..., bin_f..., hbos), ordered
    * by (hbos desc, keyCols) — deterministic because the product score
    * is exact IEEE arithmetic on identical integer counts.
    */
  def topOutliers(df: DataFrame, keyCols: Seq[String], features: Seq[String],
      nBins: Int = 20, k: Int = 20): DataFrame = {
    val scored = score(df, features, nBins)
    scored.select((keyCols ++ features.map(f => s"bin_$f") :+ "hbos").map(col): _*)
      .orderBy(col("hbos").desc +: keyCols.map(col): _*)
      .limit(k)
  }
}
