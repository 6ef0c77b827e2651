package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick: map `name=value` categorical features into a
  * fixed-dimension signed bucket space with no vocabulary fit, no
  * dictionary broadcast, and no unbounded-cardinality state — how
  * large-scale linear/factorization models vectorize high-cardinality
  * categoricals (a new value at serving time hashes like any other).
  *
  * 100 TB design: purely row-local codegen'd expressions (md5 slice →
  * bucket + sign) followed by one map-side-combined groupBy — there is
  * no fitted state at all, which is the entire point of the trick. The
  * hash family is the repo-wide md5-slice convention, so any engine
  * (and the DuckDB oracle) replays buckets and signs bit-for-bit.
  */
object FeatureHasher {

  /** Bucket in [0, dim) for a feature string: 60-bit md5 prefix mod dim. */
  def bucket(feature: Column, dim: Int): Column =
    conv(substring(md5(feature.cast("binary")), 1, 15), 16, 10).cast("long") % dim

  /** Sign (+1/-1) from an independent md5 slice — the standard
    * collision-debiasing trick (colliding features cancel in
    * expectation instead of piling up).
    */
  def sign(feature: Column): Column =
    when(conv(substring(md5(feature.cast("binary")), 16, 1), 16, 10)
      .cast("long") % 2 === 0, 1L).otherwise(-1L)

  /** (id, bucket, wsum): the signed hashed vector per row of `df`, from
    * the given categorical columns encoded as `name=value`. Rows of the
    * sparse output are one per (id, occupied bucket).
    */
  def hashedFeatures(df: DataFrame, idCol: String, featureCols: Seq[String],
      dim: Int = 32): DataFrame = {
    require(dim > 0, s"dim=$dim must be positive")
    val feats = featureCols.map(c =>
      concat(lit(c), lit("="), col(c).cast("string")))
    df.select(col(idCol).as("id"), explode(array(feats: _*)).as("feature"))
      .select(col("id"), bucket(col("feature"), dim).as("bucket"),
        sign(col("feature")).as("w"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("w")).as("wsum"))
  }
}
