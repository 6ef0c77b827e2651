package graft

import graft.plans.{GraftTables, ManifestPrunedFileIndex}
import graft.sources.{ManifestScan, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** SQL write path (`INSERT INTO graft.<name>`) and the per-generation
  * relation cache: one INSERT text must land data AND manifest rows
  * (or a versioned commit), reads through the name must prune
  * immediately, and repeated statements over a stable layout must not
  * re-infer schema.
  */
class GraftSqlInsertSpec extends SparkSpec {

  private val tmpBase = System.getProperty("java.io.tmpdir")

  private def docs = Tables.load(spark, TestSpark.sf0001, "documents")
    .select(col("doc_id"), col("n_chars"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def scanIndex(df: DataFrame) =
    TestSpark.findExec[FileSourceScanExec](df.queryExecution.executedPlan)
      .getOrElse(fail("no FileSourceScanExec in the executed plan"))
      .relation.location

  private def manifestFileCount(p: String): Long =
    spark.read.parquet(s"$p/${ManifestScan.ManifestDir}").count()

  private def stageFlat(tag: String): String = {
    val p = s"$tmpBase/graft_sqlins_$tag"
    LocalFs.deleteRec(p)
    docs.filter(col("doc_id") % 2 === 0)
      .repartitionByRange(4, col("n_chars"))
      .write.mode("overwrite").parquet(p)
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    GraftTables.register(s"sqlins_$tag", p)
    p
  }

  test("INSERT INTO lands data + manifest rows; the named read prunes immediately") {
    val p = stageFlat("basic")
    val before = manifestFileCount(p)
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("sqlins_src")
    spark.sql("INSERT INTO graft.sqlins_basic SELECT doc_id, n_chars FROM sqlins_src")
    assert(manifestFileCount(p) > before,
      "the INSERT must extend the manifest, not just append data")
    assert(rows(spark.sql("SELECT doc_id, n_chars FROM graft.sqlins_basic")) == rows(docs))
    val pruned = spark.sql(
      "SELECT doc_id, n_chars FROM graft.sqlins_basic WHERE n_chars BETWEEN 200 AND 260")
    assert(scanIndex(pruned).isInstanceOf[ManifestPrunedFileIndex],
      "a range over the freshly inserted layout must prune through the refreshed manifest")
    assert(rows(pruned) == rows(docs.filter(col("n_chars").between(200, 260))))
  }

  test("INSERT is append-semantics: run twice, rows land twice") {
    stageFlat("twice")
    docs.limit(10).createOrReplaceTempView("sqlins_src10")
    spark.sql("INSERT INTO graft.sqlins_twice SELECT doc_id, n_chars FROM sqlins_src10")
    spark.sql("INSERT INTO graft.sqlins_twice SELECT doc_id, n_chars FROM sqlins_src10")
    val evens = docs.filter(col("doc_id") % 2 === 0).count()
    assert(spark.sql("SELECT * FROM graft.sqlins_twice").count() == evens + 20)
  }

  test("VALUES form inserts and casts by position to the table schema") {
    val p = stageFlat("values")
    spark.sql("INSERT INTO graft.sqlins_values VALUES (900001, 123), (900002, 456)")
    val got = spark.sql(
      "SELECT doc_id, n_chars FROM graft.sqlins_values WHERE doc_id >= 900001 ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((900001L, 123L), (900002L, 456L)))
    // and the literal ints were cast to the table's long columns
    assert(spark.read.parquet(p).schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("INSERT into a VERSIONED table is a commit: new generation + pointer flip") {
    val p = s"$tmpBase/graft_sqlins_versioned"
    LocalFs.deleteRec(p)
    docs.filter(col("doc_id") % 2 === 0)
      .repartitionByRange(4, col("n_chars")).write.mode("overwrite").parquet(p)
    VersionedTable.init(spark, p, Seq("n_chars"))
    GraftTables.register("sqlins_versioned", p)
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("sqlins_vsrc")
    spark.sql("INSERT INTO graft.sqlins_versioned SELECT doc_id, n_chars FROM sqlins_vsrc")
    assert(VersionedTable.currentVersion(spark, p).contains(2L),
      "the SQL INSERT must commit version 2")
    assert(rows(spark.sql("SELECT doc_id, n_chars FROM graft.sqlins_versioned")) == rows(docs))
    assert(rows(VersionedTable.snapshotAt(spark, p, 1)) ==
      rows(docs.filter(col("doc_id") % 2 === 0)), "v1 must stay addressable")
  }

  test("INSERT right after buildManifest maintains the manifest (write path bypasses the negative cache)") {
    val p = s"$tmpBase/graft_sqlins_negcache"
    LocalFs.deleteRec(p)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("overwrite").parquet(p)
    GraftTables.register("sqlins_negcache", p)
    // pre-build INSERT: probes for a manifest, finds none (seeding the
    // loader's 60s negative entry), lands a plain parquet append
    spark.sql("INSERT INTO graft.sqlins_negcache VALUES (900001, 11)")
    ManifestScan.buildManifest(spark, p, Seq("n_chars"))
    val covered = manifestFileCount(p)
    // pre-fix, the cached miss made this degrade to a plain append with
    // no manifest row for up to a minute - silently breaking the
    // "a SQL writer cannot forget manifest upkeep" contract
    spark.sql("INSERT INTO graft.sqlins_negcache VALUES (900002, 12)")
    assert(manifestFileCount(p) == covered + 1,
      "an INSERT immediately after buildManifest must extend the manifest " +
        "(the negative cache must not swallow a freshly built one)")
    assert(spark.sql("SELECT * FROM graft.sqlins_negcache WHERE doc_id >= 900001").count() == 2)
  }

  test("concurrent INSERTs into a versioned table inherit the optimistic retry: both commit") {
    val p = s"$tmpBase/graft_sqlins_race"
    LocalFs.deleteRec(p)
    docs.filter(col("doc_id") % 2 === 0).coalesce(2).write.mode("overwrite").parquet(p)
    VersionedTable.init(spark, p, Seq("n_chars"))
    GraftTables.register("sqlins_race", p)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(900101, 900102).map(id => new Thread(() => {
      try {
        barrier.await()
        spark.sql(s"INSERT INTO graft.sqlins_race VALUES ($id, 7)")
      } catch { case e: Throwable => errors.add(e) }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errors.isEmpty,
      s"both racing SQL INSERTs must commit (loser retries): ${errors.peek()}")
    assert(VersionedTable.currentVersion(spark, p).contains(3L),
      "two INSERTs = two serialized commits = version 3")
    assert(spark.sql("SELECT * FROM graft.sqlins_race WHERE doc_id >= 900101").count() == 2,
      "each racer's row must land exactly once")
  }

  test("refusals: OVERWRITE, column lists, arity mismatch; unregistered names untouched") {
    stageFlat("refuse")
    docs.limit(1).createOrReplaceTempView("sqlins_one")
    intercept[UnsupportedOperationException] {
      spark.sql("INSERT OVERWRITE graft.sqlins_refuse SELECT doc_id, n_chars FROM sqlins_one")
    }
    intercept[UnsupportedOperationException] {
      spark.sql("INSERT INTO graft.sqlins_refuse (doc_id) SELECT doc_id FROM sqlins_one")
    }
    val arity = intercept[Exception] {
      spark.sql("INSERT INTO graft.sqlins_refuse SELECT doc_id FROM sqlins_one")
    }
    assert(arity.getMessage.contains("columns"), s"got: ${arity.getMessage}")
    // unregistered name: the ordinary analyzer error, not a graft one
    val unknown = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft.sqlins_nosuch SELECT doc_id, n_chars FROM sqlins_one")
    }
    assert(unknown.getMessage.toLowerCase.contains("table"))
  }

  test("a broken INSERT source reports its own error, not a phantom missing table") {
    stageFlat("err")
    docs.limit(1).createOrReplaceTempView("sqlins_err_src")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft.sqlins_err SELECT no_such_col FROM sqlins_err_src")
    }
    assert(e.getMessage.contains("no_such_col"),
      s"the column typo must surface, not TABLE_OR_VIEW_NOT_FOUND; got: ${e.getMessage}")
  }

  test("relation resolution is cached per layout generation; self-join resolves") {
    val p = stageFlat("cache")
    def selectOnce(): Unit =
      spark.sql("SELECT count(*) AS n FROM graft.sqlins_cache").collect()
    selectOnce() // build (or reuse a prior test's warm entry)
    val warm = GraftTables.relationBuilds
    selectOnce(); selectOnce()
    assert(GraftTables.relationBuilds == warm,
      "repeated statements over a stable layout must reuse the cached relation")
    // a write moves the layout signature -> exactly one rebuild
    // (ids shifted out of range: the self-join below counts on unique keys)
    docs.limit(5).createOrReplaceTempView("sqlins_c5")
    spark.sql(
      "INSERT INTO graft.sqlins_cache SELECT doc_id + 1000000, n_chars FROM sqlins_c5")
    selectOnce(); selectOnce()
    assert(GraftTables.relationBuilds == warm + 1,
      "a new generation must rebuild the relation exactly once")
    // the cached relation reused on BOTH sides of a self-join:
    // DeduplicateRelations must re-alias (LogicalRelation is a
    // MultiInstanceRelation), not error or cartesian-collapse
    val self = spark.sql(
      """SELECT a.doc_id AS d FROM graft.sqlins_cache a
        |JOIN graft.sqlins_cache b ON a.doc_id = b.doc_id""".stripMargin)
    assert(self.count() == spark.sql("SELECT * FROM graft.sqlins_cache").count())
  }
}
