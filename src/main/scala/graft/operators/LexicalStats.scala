package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distribution-level lexical statistics for corpus curation:
  *
  *  - [[profile]]: per-document out-of-vocabulary rate, token entropy and
  *    type-token ratio — the cheap statistical quality signals (beyond
  *    the rule gates in [[graft.functions.TextFunctions.qualityScore]])
  *    that curation pipelines threshold on.
  *  - [[sourceDrift]]: per-source unigram KL divergence against the whole
  *    corpus — the mixture-drift monitor that catches a source whose
  *    content distribution has shifted (scraper broke, boilerplate
  *    flood) before it poisons a training mix.
  *
  * 100 TB design: everything reduces to (doc|source, token) count
  * aggregations — map-side combined, one shuffle each on short keys. The
  * corpus-wide vocabulary/count tables are |vocab| rows (≪ corpus) so
  * ranking them on a single partition and broadcasting them back is the
  * right trade at any scale. Float sums fold over token-sorted lists so
  * results replay bit-for-bit across engines.
  */
object LexicalStats {

  /** Per-document lexical profile against a corpus top-`vocabSize`
    * vocabulary (ranked by global count desc, token asc).
    *
    * Output: (doc_id, dl int — token occurrences, n_types int, ttr,
    * oov_rate, entropy — all double rounded 4).
    */
  def profile(docs: DataFrame, vocabSize: Int = 20, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // persist: the (doc, token) counts feed dl/types, the OOV join and
    // the entropy fold — three consumers of one tokenize+explode pass
    val tf = ScanFanout.byKey(docs, col(idCol)) // guide §2.5: fan out before tokenize
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"), count(lit(1)).as("n_types"))
    // corpus vocabulary: |vocab| rows — global window is deliberate
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("_cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_cnt").desc, col("token"))))
      .filter(col("rk") <= vocabSize)
      .select(col("token"))
    val oov = tf.join(broadcast(vocab.withColumn("_inv", lit(1))), Seq("token"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("_inv").isNull, col("tf")).otherwise(lit(0L))).as("oov_occ"))
    val ent = tf.join(dl.select(col("doc_id"), col("dl")), Seq("doc_id"))
      .select(col("doc_id"), col("token"),
        (-(col("tf").cast("double") / col("dl").cast("double"))
          * log(col("tf").cast("double") / col("dl").cast("double"))).as("part"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("token"), col("part")))).as("_p"))
      .select(col("doc_id"),
        round(aggregate(col("_p.part"), lit(0.0), (acc, x) => acc + x), 4).as("entropy"))
    dl.join(oov, Seq("doc_id")).join(ent, Seq("doc_id"))
      .select(col("doc_id"), col("dl").cast("int").as("dl"),
        col("n_types").cast("int").as("n_types"),
        round(col("n_types").cast("double") / col("dl").cast("double"), 4).as("ttr"),
        round(col("oov_occ").cast("double") / col("dl").cast("double"), 4).as("oov_rate"),
        col("entropy"))
  }

  /** Per-source KL(P_source ‖ P_corpus) over unigram distributions.
    *
    * Output: (source, n_tokens int, kl double rounded 4). The per-source
    * fold runs over the full vocabulary sorted by token — |vocab| terms,
    * cheap at any corpus size.
    */
  def sourceDrift(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val sf = docs
      .select(col(sourceCol).as("source"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("sc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val st = sf.groupBy(col("source")).agg(sum(col("sc")).as("stot"))
    val cf = sf.groupBy(col("token")).agg(sum(col("sc")).as("cc"))
    val ct = cf.agg(sum(col("cc")).as("ctot"))
    val ps = col("sc").cast("double") / col("stot").cast("double")
    val pc = col("cc").cast("double") / col("ctot").cast("double")
    sf.join(st, Seq("source"))
      .join(cf, Seq("token"))
      .crossJoin(broadcast(ct))
      .select(col("source"), col("token"), col("stot"), (ps * log(ps / pc)).as("part"))
      .groupBy(col("source"))
      .agg(max(col("stot")).as("stot"),
        array_sort(collect_list(struct(col("token"), col("part")))).as("_p"))
      .select(col("source"), col("stot").cast("int").as("n_tokens"),
        round(aggregate(col("_p.part"), lit(0.0), (acc, x) => acc + x), 4).as("kl"))
  }
}
