package graft

import graft.operators.{LexicalStats, NgramLanguageModel, SparseSimilarity}
import org.apache.spark.sql.functions._

class NgramLanguageModelSpec extends SparkSpec {

  test("add-alpha bigram log-likelihood matches hand computation") {
    val s = spark; import s.implicits._
    // c2: (a,b)=3, (b,a)=1, (b,c)=1; c1: a·=3, b·=2; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = NgramLanguageModel.scoreDocs(docs, alpha = 0.5)
      .collect().map(x => x.getLong(0) -> x).toMap
    val pAB = math.log(3.5 / 4.5)
    val pBA = math.log(1.5 / 3.5)
    val pBC = math.log(1.5 / 3.5)
    assert(r(1L).getAs[Int]("n_bigrams") == 3)
    assert(math.abs(r(1L).getAs[Double]("avg_ll") - (pAB + pBA + pAB) / 3) < 1e-3)
    assert(r(2L).getAs[Int]("n_bigrams") == 2)
    assert(math.abs(r(2L).getAs[Double]("avg_ll") - (pAB + pBC) / 2) < 1e-3)
  }

  test("documents with fewer than two tokens have no score row") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "only"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = NgramLanguageModel.scoreDocs(docs).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("a doc of corpus-typical bigrams outscores a doc of rare ones") {
    val s = spark; import s.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, "the quick fox")) :+
      (99L, "zxq wvu zxq")).toDF("doc_id", "text")
    val r = NgramLanguageModel.scoreDocs(docs)
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("avg_ll")).toMap
    assert(r(1L) > r(99L))
  }
}

class LexicalStatsSpec extends SparkSpec {

  test("profile: dl/types/ttr/oov/entropy on a hand-built fixture") {
    val s = spark; import s.implicits._
    // corpus counts: a=2, b=1, c=4 → top-1 vocab = {c}
    val docs = Seq((1L, "a a b"), (2L, "c c c c")).toDF("doc_id", "text")
    val r = LexicalStats.profile(docs, vocabSize = 1)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("dl") == 3 && r(1L).getAs[Int]("n_types") == 2)
    assert(r(1L).getAs[Double]("ttr") == 0.6667)
    assert(r(1L).getAs[Double]("oov_rate") == 1.0)
    val h = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(math.abs(r(1L).getAs[Double]("entropy") - h) < 1e-3)
    assert(r(2L).getAs[Double]("oov_rate") == 0.0)
    assert(r(2L).getAs[Double]("entropy") == 0.0)
    assert(r(2L).getAs[Double]("ttr") == 0.25)
  }

  test("sourceDrift: symmetric two-source split gives KL = ln 2 each") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a a", "srcA"), (2L, "b b", "srcB")).toDF("doc_id", "text", "source")
    val r = LexicalStats.sourceDrift(docs)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("kl")).toMap
    assert(math.abs(r("srcA") - math.log(2.0)) < 1e-3)
    assert(math.abs(r("srcB") - math.log(2.0)) < 1e-3)
  }

  test("sourceDrift: a single source matching the corpus has KL 0") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b c", "only"), (2L, "c b a", "only")).toDF("doc_id", "text", "source")
    val r = LexicalStats.sourceDrift(docs).collect()
    assert(r.length == 1 && r.head.getAs[Double]("kl") == 0.0)
  }
}

class BpeMergesSpec extends SparkSpec {

  test("counts adjacent in-word character pairs; single-char words excluded") {
    val s = spark; import s.implicits._
    // "abab" -> ab, ba, ab ; "ab" -> ab ; "x" -> none
    val docs = Seq((1L, "abab ab x")).toDF("doc_id", "text")
    val r = graft.operators.BpeMerges.topMerges(docs, k = 10)
      .collect().map(x => x.getString(1) -> (x.getInt(0), x.getLong(2))).toMap
    assert(r("ab") == (1, 3L))
    assert(r("ba") == (2, 1L))
    assert(r.size == 2)
  }
}

class SnapshotDiffSpec extends SparkSpec {

  test("classifies added/removed/changed/unchanged by content hash") {
    val s = spark; import s.implicits._
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val r = graft.operators.SnapshotDiff.diffStatus(v1, v2)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }
}

class NegativeSamplerSpec extends SparkSpec {

  test("k negatives per query, never a content match, reproducible") {
    val s = spark; import s.implicits._
    val corpus = (1L to 100L).map(i => (i, if (i == 7L) "querytext" else s"doc $i"))
      .toDF("doc_id", "text")
    val queries = Seq((7L, "querytext")).toDF("doc_id", "text")
    val r = graft.operators.NegativeSampler.negatives(queries, corpus, k = 5, sliceMod = 1)
      .collect()
    assert(r.length == 5)
    assert(r.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    assert(!r.map(_.getLong(1)).contains(7L)) // the content match is excluded
    val again = graft.operators.NegativeSampler.negatives(queries, corpus, k = 5, sliceMod = 1)
      .collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet ==
      again.map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet)
  }

  test("query set broadcasts — the corpus never sort-merges") {
    val s = spark; import s.implicits._
    val corpus = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val queries = Seq((1L, "doc 1")).toDF("doc_id", "text")
    val p = graft.operators.NegativeSampler.negatives(queries, corpus, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "corpus must not sort-merge:\n" + p)
  }
}

class FunnelSpec extends SparkSpec {

  test("strict ordering: a later view cannot retro-qualify an earlier click") {
    val s = spark; import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      // user 1 completes in order: view@10, click@20, purchase@30
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: click BEFORE first view → t2 must be null
      (2L, "click", ts(5)), (2L, "view", ts(10)),
      // user 3: never views → absent from the funnel
      (3L, "click", ts(1)), (3L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val r = graft.operators.Funnel.conversion(events, Seq("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L).getLong(1) == 10000000L && r(1L).getLong(2) == 20000000L
      && r(1L).getLong(3) == 30000000L)
    assert(r(2L).getLong(1) == 10000000L && r(2L).isNullAt(2) && r(2L).isNullAt(3))
  }

  test("first qualifying occurrence wins at each stage") {
    val s = spark; import s.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(12)), (1L, "click", ts(11))
    ).toDF("user_id", "event_type", "ts")
    val r = graft.operators.Funnel.conversion(events, Seq("view", "click")).collect()
    assert(r.head.getLong(2) == 11000000L)
  }
}

class RetentionSpec extends SparkSpec {

  test("cohorts count distinct users per offset; pre-signup activity excluded") {
    val s = spark; import s.implicits._
    val week = 7L * 86400L * 1000L // ms
    def ts(w: Long) = new java.sql.Timestamp(w * week + 1000L)
    val events = Seq(
      (1L, "signup", ts(0)), (1L, "click", ts(0)), (1L, "click", ts(1)), // w0 + w1
      (2L, "signup", ts(0)), (2L, "click", ts(0)),                       // w0 only
      (3L, "click", ts(0)), (3L, "signup", ts(1))                        // pre-signup w0 dropped
    ).toDF("user_id", "event_type", "ts")
    val r = graft.operators.Retention.cohorts(events)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val c0 = r.keys.map(_._1).min // epoch week of ts(0)
    assert(r((c0, 0L)) == 2L)      // users 1 and 2 active in signup week
    assert(r((c0, 1L)) == 1L)      // only user 1 returns
    assert(r((c0 + 1, 0L)) == 1L)  // user 3's cohort starts a week later
    assert(!r.keys.exists(_._2 < 0))
  }
}

class SkewDiagnosticsSpec extends SparkSpec {

  test("heavy hitters: counts, shares, cumulative share, tie-break by key") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c")).map(Tuple1(_)).toDF("k")
    val r = graft.operators.SkewDiagnostics.heavyHitters(df, "k", k = 2).collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a", "b")) // tie b/c → key order
    assert(r.head.getLong(2) == 6L && r.head.getDouble(3) == 0.5)
    assert(r(1).getDouble(4) == 0.75) // cum share over the top-2
  }

  test("null keys tie-break LAST (DuckDB order), not Spark's nulls-first default") {
    val s = spark; import s.implicits._
    val df = (Seq.fill(3)(Some("a")) ++ Seq.fill(3)(Option.empty[String]))
      .map(Tuple1(_)).toDF("k")
    val r = graft.operators.SkewDiagnostics.heavyHitters(df, "k", k = 2).collect()
    assert(r.head.getString(1) == "a" && r(1).isNullAt(1))
  }
}

class EmbeddingDriftSpec extends SparkSpec {

  test("aligned group has cos 1; orthogonal group drifts; norms scale") {
    val s = spark; import s.implicits._
    // group A: all vectors along e1; group B: along e2. Corpus centroid
    // sits between → both groups at cos ~0.707, A's norm = B's norm.
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0), (2L, Seq(1f, 0f, 0f, 0f), 0),
      (3L, Seq(0f, 1f, 0f, 0f), 1), (4L, Seq(0f, 1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = graft.operators.EmbeddingDrift.groupCentroidDrift(emb)
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(0).getAs[Int]("n_vecs") == 2)
    assert(math.abs(r(0).getAs[Double]("cos_to_corpus") - math.sqrt(0.5)) < 1e-4)
    assert(math.abs(r(1).getAs[Double]("cos_to_corpus") - math.sqrt(0.5)) < 1e-4)
    // each group's mean has norm 1; corpus mean norm = sqrt(2)/2
    assert(math.abs(r(0).getAs[Double]("norm_ratio") - math.sqrt(2.0)) < 1e-4)
  }

  test("a group identical to the corpus has cos 1 and norm ratio 1") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (1L, Seq(0.3f, 0.4f, 0.5f), 7), (2L, Seq(0.3f, 0.4f, 0.5f), 7)
    ).toDF("vec_id", "embedding", "label")
    val r = graft.operators.EmbeddingDrift.groupCentroidDrift(emb).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("cos_to_corpus") == 1.0)
    assert(r.head.getAs[Double]("norm_ratio") == 1.0)
  }
}

class SparseSimilaritySpec extends SparkSpec {

  test("identical docs reach cosine 1.0; disjoint docs pair with nothing") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z w"),          // identical
      (3L, "p q r s t")                          // disjoint (keeps idf > 0)
    ).toDF("doc_id", "text")
    val r = SparseSimilarity.cosinePairs(docs, n = 3, threshold = 0.3).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("id_a") == 1L && r.head.getAs[Long]("id_b") == 2L)
    assert(r.head.getAs[Double]("cos") == 1.0)
    assert(r.head.getAs[Int]("n_common") == 2)
  }

  test("document-frequency cap removes over-common terms before pairing") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "a b c")).toDF("doc_id", "text")
    // "x y z" has df=2 > cap=1 → capped away → no candidate pairs at all
    assert(SparseSimilarity.cosinePairs(docs, n = 3, maxTermDf = 1).isEmpty)
  }
}
