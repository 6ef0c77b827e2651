package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension label-leakage screen: the mutual information between
  * each (fixed-width-binned) embedding coordinate and the class label —
  * the representation audit that finds dimensions ENCODING the label
  * (target leakage into features, or a representation that memorized
  * its supervision) before anyone trains on them. MI(dim) =
  * Σ_{b,ℓ} p(b,ℓ)·ln(p(b,ℓ)/(p(b)p(ℓ))): 0 ⇔ independent, and a
  * dimension whose bin determines the label scores ln(#classes).
  *
  * Determinism contract (house style): coordinates quantize to integer
  * micros, bins are exact integer floor division (pmod form — no
  * truncate-toward-zero bias on negatives), every probability is a
  * ratio of exact integer counts, and the only floats are the final
  * ln/ratio terms, rounded for display. The ranking orders by the
  * ROUNDED score so an external replay cannot disagree below the
  * displayed precision.
  *
  * Scale shape: one posexplode to (dim, bin, label) counts —
  * map-side combined into a (d × bins × classes)-sized frame however
  * large the corpus — then three tiny rollups of that frame and one
  * join-back. Nothing downstream of the first combine scales with rows.
  */
object MutualInfo {

  /** (dim, n, mi) for every vector dimension, ranked by mi descending.
    * `binWidth` is in quantized micros (default 0.1 in coordinate
    * units). Null labels are excluded (they belong to no class).
    */
  def labelLeakage(df: DataFrame, vecCol: String, labelCol: String,
      binWidth: Long = 100000L): DataFrame = {
    require(binWidth > 0, s"labelLeakage: binWidth must be > 0, got $binWidth")
    val v = round(col("x").cast("double") * 1000000).cast("long")
    val e = df.filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"), col("label"),
        ((v - pmod(v, lit(binWidth))) / lit(binWidth)).cast("long").as("bin"))
    val c = e.groupBy(col("dim"), col("bin"), col("label"))
      .agg(count(lit(1)).as("nbl"))
    val tb = c.groupBy(col("dim"), col("bin")).agg(sum(col("nbl")).as("nb"))
    val tl = c.groupBy(col("dim"), col("label")).agg(sum(col("nbl")).as("nl"))
    val tn = c.groupBy(col("dim")).agg(sum(col("nbl")).as("n"))
    c.join(tb, Seq("dim", "bin")).join(tl, Seq("dim", "label")).join(tn, Seq("dim"))
      .groupBy(col("dim"))
      .agg(max(col("n")).as("n"),
        sum((col("nbl").cast("double") / col("n")) *
          log(col("nbl").cast("double") * col("n") /
            (col("nb").cast("double") * col("nl")))).as("mi_raw"))
      .select(col("dim"), col("n"), round(col("mi_raw"), 6).as("mi"))
      .orderBy(col("mi").desc, col("dim"))
  }
}
