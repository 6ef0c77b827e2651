package graft

import graft.operators.EmbeddingProfile
import org.apache.spark.sql.functions._

/** The JL random projection and covariance diagnostics against local
  * reimplementations: exact integer replay of the hash-sign projection
  * (the oracle contract), the E[‖y‖²] = k·‖q‖² norm band on a
  * deterministic synthetic corpus, and brute-force covariance parity.
  */
class RandomProjectionSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 64
  private val k = 16
  private val M = 4294967296L

  private def signRef(i: Long, j: Long): Long = {
    val h0 = java.lang.Math.floorMod((i * 2654435761L) ^ (j * 2246822519L), M)
    if (java.lang.Math.floorMod(h0 * 48611L, M) < 2147483648L) 1L else -1L
  }

  // deterministic pseudo-uniform corpus: v(id, i) ∈ [-1, 1] on a grid
  private def vec(id: Int): Array[Float] =
    Array.tabulate(dim)(i => ((((id * 31 + i * 17) % 101) - 50) / 50.0).toFloat)

  private lazy val corpus =
    (0 until 200).map(id => (id.toLong, vec(id).toSeq)).toDF("vec_id", "embedding")

  test("projection replays the reference bit-for-bit") {
    val got = EmbeddingProfile.randomProject(corpus, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 200).foreach { id =>
      val q = vec(id).map(x => math.round(x.toDouble * 1000000))
      (0 until k).foreach { j =>
        val want = (0 until dim).map(i => signRef(i, j) * q(i)).sum
        assert(got((id.toLong, j)) === want, s"vec $id dim $j")
      }
    }
  }

  test("norms are preserved in the JL band: E[|y|^2] = k * |q|^2") {
    val ratios = EmbeddingProfile.randomProject(corpus, "vec_id", "embedding", k)
      .groupBy($"vec_id").agg(sum($"y" * $"y").as("p2"))
      .collect().map { r =>
        val q = vec(r.getLong(0).toInt).map(x => math.round(x.toDouble * 1000000))
        r.getLong(1).toDouble / (k.toDouble * q.map(v => v.toDouble * v).sum)
      }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.3, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.25 && r < 3.0),
      s"outlier ratio: min ${ratios.min} max ${ratios.max}")
  }

  test("covariance top-k matches the brute-force Gram computation") {
    val small = (0 until 50).map(id => (id.toLong, vec(id).toSeq)).toDF("vec_id", "embedding")
    val got = EmbeddingProfile.covarianceTopK(small, "embedding", k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    // brute force over the quantized coordinates
    val qs = (0 until 50).map(id => vec(id).map(x => math.round(x.toDouble * 1000000)))
    val n = qs.length.toLong
    val brute = (for { i <- 0 until dim; j <- (i + 1) until dim } yield {
      val s1 = qs.map(_(i)).sum
      val s2 = qs.map(_(j)).sum
      val sxy = qs.map(q => q(i) * q(j)).sum
      val num = BigInt(n) * sxy - BigInt(s1) * s2
      (i, j, num)
    }).sortBy { case (i, j, num) => (-num.abs, i, j) }.take(10)
    got.zip(brute).foreach { case ((gi, gj, gn, gcov), (bi, bj, bnum)) =>
      assert((gi, gj) === (bi, bj))
      assert(gn === n)
      val want = BigDecimal(bnum.toDouble / (n * n) / 1.0e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gcov - want) < 1e-9, s"pair ($gi,$gj): $gcov vs $want")
    }
  }
}
