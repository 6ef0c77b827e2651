package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** SparkSessionExtensions installer: registers the engine's scalar
  * primitives in the SQL FunctionRegistry, so `spark.sql("...")` users
  * get the same codegen'd expressions as the DataFrame API —
  * `graft_dot` (the native [[graft.expressions.DotProduct]]),
  * `graft_haversine_m`, and `graft_hamming64`.
  *
  * Builders must return raw CATALYST trees: routing through the Column
  * API here would wrap children in Spark 4's `ColumnNodeExpression`
  * (Unevaluable — the analyzer does not resolve inside it from a
  * FunctionRegistry builder). The haversine tree below therefore
  * restates [[GeoFunctions.haversineMeters]] in catalyst nodes;
  * ExtensionsSpec pins the two paths to bit-identical results.
  *
  * Installed by `Sessions.configure` via `Builder.withExtensions`; a
  * cluster deployment can equally set
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.register(ext)
}

object GraftExtensions {

  private def fn(name: String, arity: Int, usage: String)(
      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name expects $arity arguments: $usage")
        build(children)
      })

  private def dbl(e: Expression): Expression = Cast(e, DoubleType)

  /** Haversine metres in catalyst nodes — keep in lockstep with
    * [[GeoFunctions.haversineMeters]] (asserted equal in ExtensionsSpec).
    */
  private def haversineM(lat1: Expression, lon1: Expression,
      lat2: Expression, lon2: Expression): Expression = {
    def sin2half(a: Expression, b: Expression): Expression =
      Pow(Sin(Divide(ToRadians(Subtract(dbl(a), dbl(b))), Literal(2.0))), Literal(2.0))
    val inter = Add(
      sin2half(lat1, lat2),
      Multiply(Multiply(sin2half(lon1, lon2),
        Cos(ToRadians(dbl(lat1)))), Cos(ToRadians(dbl(lat2)))))
    Multiply(
      Atan2(Sqrt(inter),
        Sqrt(Greatest(Seq(Subtract(Literal(1.0), inter), Literal(0.0))))),
      Literal(2 * GeoFunctions.EarthRadiusM))
  }

  def register(ext: SparkSessionExtensions): Unit = {
    // Whole-operator surface: the native as-of join logical node gets a
    // planner strategy (→ graft.plans.AsOfJoinExec) and an optimizer
    // rule pushing left-only filters below the (outer) join.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushLeftFiltersThroughAsOf)
    // ... and the native keyed interval-containment join, same ladder.
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFiltersThroughIntervalJoin)
    // AQE skew-splitting for both native sort-merge execs — the mirror
    // of Spark's OptimizeSkewedJoin (which matches SMJ/SHJ by class and
    // cannot see custom execs), running in the builtin rule's own slot
    // (queryStagePreparationRules, right after it).
    ext.injectQueryStagePrepRule(_ =>
      org.apache.spark.sql.graftbridge.OptimizeSkewedGraftJoin)
    // Automatic stats-based file skipping over `_graft_manifest`
    // layouts: a range filter over a manifested parquet directory
    // replans to read only the overlapping files (conservative — the
    // filter stays; see graft.plans.ManifestFileSkipping).
    ext.injectOptimizerRule(_ => graft.plans.ManifestFileSkipping)
    // ... and its RUNTIME sibling: join-driven file skipping (the
    // file-grain analogue of dynamic partition pruning) — once a
    // broadcast build side materializes, the streamed manifested scan
    // replans to open only the files that can hold one of the build
    // side's actual keys.
    ext.injectQueryStagePrepRule(_ =>
      org.apache.spark.sql.execution.graftdpp.DynamicManifestFileSkipping)
    // SQL front door for both native joins: TVFs plant unresolved
    // placeholders; the resolution rule rewrites them into the real
    // nodes once their inputs resolve (graft.plans.SqlFrontDoor).
    ext.injectTableFunction(graft.plans.SqlFrontDoor.asOfTvf)
    ext.injectTableFunction(graft.plans.SqlFrontDoor.intervalTvf)
    ext.injectResolutionRule(_ => graft.plans.ResolveGraftJoins)
    // Named-table SQL front door for manifested layouts:
    // `graft.<name>` in SQL text resolves to the registered parquet
    // path's V1 relation, so the manifest file-skipping rules apply
    // to spark.sql users too (graft.plans.GraftTables).
    ext.injectResolutionRule(s => new graft.plans.ResolveGraftTables(s))
    // ... and SQL time travel over registered VERSIONED tables:
    // SELECT * FROM graft_snapshot('name', 3)
    ext.injectTableFunction(graft.plans.GraftTables.snapshotTvf)
    ext.injectFunction(fn("graft_dot", 2, "graft_dot(array<double>, array<double>)") {
      ch => graft.expressions.DotProduct(
        Cast(ch(0), ArrayType(DoubleType)), Cast(ch(1), ArrayType(DoubleType)))
    })
    ext.injectFunction(fn("graft_haversine_m", 4,
      "graft_haversine_m(lat1, lon1, lat2, lon2) -> metres") {
      ch => haversineM(ch(0), ch(1), ch(2), ch(3))
    })
    ext.injectFunction(fn("graft_hamming64", 2, "graft_hamming64(bigint, bigint)") {
      ch => BitwiseCount(BitwiseXor(Cast(ch(0), LongType), Cast(ch(1), LongType)))
    })
    ext.injectFunction(fn("graft_pip", 3,
      "graft_pip(x, y, array<double> literal polygon [x0,y0,x1,y1,...])") { ch =>
      val polyExpr = Cast(ch(2), ArrayType(DoubleType))
      require(polyExpr.foldable, "graft_pip: polygon must be a literal array")
      val arr = polyExpr.eval(null) match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toDoubleArray.toSeq
        case other => throw new IllegalArgumentException(
          s"graft_pip: polygon must be array<double>, got $other")
      }
      graft.expressions.PointInPolygon(dbl(ch(0)), dbl(ch(1)), arr)
    })
    ext.injectFunction(fn("graft_ngrams", 2,
      "graft_ngrams(text, n int literal) -> rows of (pos, ngram)") { ch =>
      val n = ch(1) match {
        case Literal(v: Number, _) => v.intValue
        case other => throw new IllegalArgumentException(
          s"graft_ngrams: n must be an integer literal, got $other")
      }
      graft.expressions.NgramExplode(ch(0), n)
    })
    ext.injectFunction(fn("graft_char_kmers", 2,
      "graft_char_kmers(text, k int literal) -> rows of (pos, kmer)") { ch =>
      val k = ch(1) match {
        case Literal(v: Number, _) => v.intValue
        case other => throw new IllegalArgumentException(
          s"graft_char_kmers: k must be an integer literal, got $other")
      }
      graft.expressions.CharKmerExplode(ch(0), k)
    })
    ext.injectFunction(fn("graft_hilbert", 3,
      "graft_hilbert(x bigint, y bigint, bits int literal)") { ch =>
      val bits = ch(2) match {
        case Literal(v: Number, _) => v.intValue
        case other => throw new IllegalArgumentException(
          s"graft_hilbert: bits must be an integer literal, got $other")
      }
      graft.expressions.HilbertIndex(
        Cast(ch(0), LongType), Cast(ch(1), LongType), bits)
    })
  }
}
