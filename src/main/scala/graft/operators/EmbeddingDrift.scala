package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor: per-group (source / cluster label)
  * centroid direction and magnitude vs the whole corpus — the vector
  * analogue of [[LexicalStats.sourceDrift]]. A source whose encoder
  * broke, or whose content shifted, shows up as a centroid swinging away
  * from the corpus mean (cos drops) or collapsing (norm ratio moves)
  * long before downstream training notices.
  *
  * 100 TB design: components are quantized to 2^20 fixed-point on the
  * way in, so all per-(group, dim) sums are EXACT integer aggregates —
  * order-free, map-side combined, one shuffle on (group, dim). The final
  * cosine folds over the `dim`-length centroid (sorted by dimension
  * index — a per-group array of 64-1024 elements, nothing like corpus
  * size), so the float result replays bit-for-bit across engines.
  * Cos(mean_g, mean_corpus) = cos(sum_g, sum_corpus): the 1/n factors
  * cancel, so means are never materialized.
  */
object EmbeddingDrift {

  /** Per-group centroid drift vs the corpus.
    * Output: (group, n_vecs int, cos_to_corpus, norm_ratio — doubles
    * rounded 6). `norm_ratio` = ‖mean_g‖ / ‖mean_corpus‖.
    */
  def groupCentroidDrift(emb: DataFrame, groupCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val scale = 1L << 20
    val q = emb
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("d", "v")))
      .select(col("grp"), col("d"), floor(col("v").cast("double") * scale).as("q"))
    // exact integer sums per (group, dim) — the only corpus-sized shuffle
    val g = q.groupBy(col("grp"), col("d")).agg(sum(col("q")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c = g.groupBy(col("d")).agg(sum(col("s")).as("sc"))
    val ng = emb.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n"))
    val nTot = emb.count().toDouble
    def fold(parts: org.apache.spark.sql.Column) =
      aggregate(parts, lit(0.0), (a, x) => a + x)
    val n2c = c
      .agg(array_sort(collect_list(struct(col("d"),
        (col("sc").cast("double") * col("sc").cast("double")).as("p")))).as("_p"))
      .select(fold(col("_p.p")).as("n2c"))
    g.join(broadcast(c), Seq("d"))
      .groupBy(col("grp"))
      .agg(
        array_sort(collect_list(struct(col("d"),
          (col("s").cast("double") * col("sc").cast("double")).as("p")))).as("_dot"),
        array_sort(collect_list(struct(col("d"),
          (col("s").cast("double") * col("s").cast("double")).as("p")))).as("_n2g"))
      .select(col("grp"), fold(col("_dot.p")).as("dot"), fold(col("_n2g.p")).as("n2g"))
      .join(ng, Seq("grp"))
      .crossJoin(broadcast(n2c))
      .select(col("grp").as("label"), col("n").cast("int").as("n_vecs"),
        round(col("dot") / (sqrt(col("n2g")) * sqrt(col("n2c"))), 6).as("cos_to_corpus"),
        round((lit(nTot) / col("n")) * sqrt(col("n2g")) / sqrt(col("n2c")), 6).as("norm_ratio"))
  }
}
