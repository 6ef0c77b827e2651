package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-proportion z-test: is cohort A's conversion rate actually
  * different from cohort B's, or is the gap noise? — the significance
  * gate every funnel/experiment comparison needs before anyone ships a
  * conclusion. z = (p₁−p₂) / √(p̂(1−p̂)(1/n₁+1/n₂)) with p̂ the pooled
  * rate; |z| > 1.96 ⇒ p < 0.05 two-sided. Complements the SRM gate
  * ([[AbAssignment]]'s χ², `q_ab_srm`) — that checks the SPLIT, this
  * checks the OUTCOME.
  *
  * All counts are exact longs; z is one fixed double expression of
  * them, so the verdict hash-replays. The input collapses to two rows
  * before this runs — driver-side assembly is constant-size.
  */
object ProportionTest {

  /** Single-row verdict from a two-row (group, n, c) frame, groups
    * ordered by name: (group_a, n_a, c_a, p_a r6, group_b, n_b, c_b,
    * p_b r6, z r6, significant at |z| > 1.96).
    */
  def twoProportionZ(counts: DataFrame, groupCol: String, nCol: String,
      cCol: String): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val rows = counts.select(col(groupCol).cast("string"),
        col(nCol).cast("long"), col(cCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.length == 2,
      s"twoProportionZ: need exactly two groups, got ${rows.map(_._1).mkString(", ")}")
    val ((ga, na, ca), (gb, nb, cb)) = (rows(0), rows(1))
    require(na > 0 && nb > 0, "twoProportionZ: empty cohort")
    val (p1, p2) = (ca.toDouble / na, cb.toDouble / nb)
    val pooled = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))
    val z = if (se == 0) 0.0 else (p1 - p2) / se
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    Seq((ga, na, ca, r6(p1), gb, nb, cb, r6(p2), r6(z), math.abs(z) > 1.96))
      .toDF("group_a", "n_a", "c_a", "p_a", "group_b", "n_b", "c_b", "p_b",
        "z", "significant")
  }
}
