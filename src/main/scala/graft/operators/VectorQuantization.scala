package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the storage/IO lever
  * for vector corpora at scale: float32 corpora quantize 4→1 bytes per
  * dimension (and brute-force scans read 4× fewer bytes) at a small,
  * measurable reconstruction error. The reference has no vector storage
  * concern; this is part of the training-data-pipeline surface
  * (ANN/embedding ops) built beyond it.
  *
  * Shape for 100 TB: the per-dimension (min, max) codebook is ONE
  * aggregate pass (posexplode → groupBy(pos), map-side combined — the
  * shuffle carries `dim × partitions` partial rows, not data), collapsed
  * to a single row of two arrays and broadcast back via a literal-free
  * cross join; quantization itself is a per-row array `transform` inside
  * whole-stage codegen — no second shuffle, no driver-side collect. All
  * arithmetic is IEEE double (+, −, ×, ÷, floor), so an external engine
  * replays it bit-for-bit — the q_vector_quantize_int8 oracle hash-checks
  * codes AND reconstruction errors end to end.
  */
object VectorQuantization {

  /** One-row codebook frame (`mins: array<double>`, `maxs: array<double>`)
    * with per-dimension extrema of `vecCol` (an `array<double>` column).
    */
  def codebook(vecs: DataFrame, vecCol: String): DataFrame =
    vecs
      .select(posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .groupBy(col("_pos"))
      .agg(min(col("_x")).as("_mn"), max(col("_x")).as("_mx"))
      .agg(collect_list(struct(col("_pos"), col("_mn"), col("_mx"))).as("_cb"))
      .select(
        transform(array_sort(col("_cb")), c => c("_mn")).as("mins"),
        transform(array_sort(col("_cb")), c => c("_mx")).as("maxs"))

  /** Quantize `vecCol` (`array<double>`) to int8 codes and annotate each
    * row with exact error accounting:
    *  - `codes`: `array<int>` in [−128, 127] — code = ⌊(x−mn)·255/(mx−mn) + ½⌋
    *    clamped to [0, 255], minus 128 (0 where the dimension is constant);
    *  - `code_sum`: exact integer sum of (code+128) over the row — any
    *    single-bit quantization drift changes it;
    *  - `err_max` / `err_sum`: max and sum of |x − dequantize(code)| over
    *    the row (sum in fixed array order, reproducible cross-engine).
    * The codebook pass runs once; everything else is codegen'd per row.
    */
  def quantizeWithError(vecs: DataFrame, vecCol: String): DataFrame = {
    val withCb = vecs.crossJoin(broadcast(codebook(vecs, vecCol)))

    def mn(i: Column): Column = element_at(col("mins"), i + 1)
    def mx(i: Column): Column = element_at(col("maxs"), i + 1)
    def deq(c: Column, i: Column): Column =
      when(mx(i) === mn(i), mn(i))
        .otherwise(mn(i) + (c + 128).cast("double") * (mx(i) - mn(i)) / 255.0)

    withCb
      .withColumn("codes",
        transform(col(vecCol), (x, i) =>
          (least(greatest(
            when(mx(i) === mn(i), lit(0L))
              .otherwise(floor((x - mn(i)) * 255.0 / (mx(i) - mn(i)) + 0.5)),
            lit(0L)), lit(255L)) - 128L).cast("int")))
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c + 128L))
      .withColumn("_errs",
        transform(col(vecCol), (x, i) =>
          abs(x - deq(element_at(col("codes"), i + 1), i))))
      .withColumn("err_max", array_max(col("_errs")))
      .withColumn("err_sum", aggregate(col("_errs"), lit(0.0), (acc, e) => acc + e))
      .drop("mins", "maxs", "_errs")
  }
}
