package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions (the
  * `SparkSessionExtensions` integration point from SURVEY.md §7.3 /
  * build-brief preference (c)): after injection, plain SQL text can call
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) ...
  *   SELECT winnow_fp(tokens, 3, 4) ...
  *
  * Two entry points: configure `spark.sql.extensions=graft.GraftExtensions`
  * at session build time (the standard extensions hook), or call
  * [[GraftExtensions.register]] on an existing session (registers into its
  * FunctionRegistry — used by the specs, whose session already exists).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = {
    // match on the evaluated VALUE: a foldable BIGINT/SMALLINT (e.g.
    // `CAST(3 AS BIGINT)`) or NULL must produce the intended "literal int"
    // error, not a raw ClassCastException/NPE during analysis
    val v = e match {
      case Literal(x: Int, IntegerType) => x
      case other if other.foldable => other.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case _ => throw new IllegalArgumentException(s"$what must be a literal int")
      }
      case _ => throw new IllegalArgumentException(s"$what must be a literal int")
    }
    v
  }

  val injected: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getCanonicalName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array arguments")
        functions.CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[functions.WinnowFingerprint].getCanonicalName, "winnow_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fp(tokens, k, w) takes three arguments")
        functions.WinnowFingerprint(args(0),
          intArg(args(1), "k"), intArg(args(2), "w"))
      }))

  /** imperative registration into an already-built session */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
