package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native kernels: after registration every graft
  * function is callable from `spark.sql(...)` / `selectExpr` by name, so a
  * SQL-only user gets the same codegen'd hot paths as the Column API.
  *
  * Two registration routes:
  *  - [[GraftFunctions.register]] — imperative, per-session.
  *  - [[GraftSqlExtensions]] — the production path: set
  *    `spark.sql.extensions=graft.functions.GraftSqlExtensions` and every
  *    session (including thrift/connect-served ones) has the functions.
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => VectorExpressions.DotProduct(es(0), es(1))),
    "graft_normsq" -> (es => VectorExpressions.NormSq(es(0))),
    "graft_jaccard" -> (es => VectorExpressions.JaccardSim(es(0), es(1))),
    "graft_jaccard_ge" -> (es => VectorExpressions.JaccardSortedGE(es(0), es(1),
      foldToDouble(es(2)))),
    "graft_shingles" -> (es => VectorExpressions.CharShingles(es(0),
      foldToInt(es(1)), sorted = false)),
    "graft_shingles_sorted" -> (es => VectorExpressions.CharShingles(es(0),
      foldToInt(es(1)), sorted = true)),
    "graft_word_ngrams" -> (es => VectorExpressions.WordNgrams(es(0),
      foldToInt(es(1)))),
    "graft_minhash" -> (es => VectorExpressions.MinHashSig(es(0), foldToInt(es(1)))),
    "graft_sig_eq_frac" -> (es => VectorExpressions.SigEqFrac(es(0), es(1))),
    "graft_simhash" -> (es => VectorExpressions.SimHash64(es(0))),
    "graft_rhp_buckets" -> (es => VectorExpressions.RhpBuckets(es(0),
      foldToInt(es(1)), foldToInt(es(2)))))

  private def foldToInt(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  private def foldToDouble(e: Expression): Double = e.eval() match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => throw new IllegalArgumentException(s"expected numeric literal, got $other")
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }

  private[functions] def injected: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] =
    fns.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name), builder)
    }
}

/** `spark.sql.extensions` injector — registers every graft function at
  * session build time.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injected.foreach(ext.injectFunction)
    // interval-overlap joins become binned hash joins (see
    // graft.plans.IntervalJoinRewrite) — injected as an optimizer rule so
    // SQL/DataFrame users get the distributable plan transparently
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
  }
}
