package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays in
  * ONE pass (dot product and both norms in the same loop), with
  * whole-stage-codegen support.
  *
  * Why not higher-order functions: `aggregate(zip_with(...))` builds an
  * intermediate array and evaluates an interpreted lambda per element —
  * three such folds per pair (dot, |a|, |b|). At 100 TB-scale similarity
  * search the per-element cost dominates, so this is the preference-order
  * (b) case from the build brief: a scalar `Expression` with `doGenCode`,
  * not a UDF. Accepts array<float> directly (no cast pass); accumulates in
  * double, element order — bit-identical to the sequential HOF fold it
  * replaces, so DuckDB oracles are unaffected.
  *
  * Null/empty handling: null input → null; element nulls are not expected
  * (embedding fixtures are dense); zero-norm inputs → null (undefined).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched dimensionality is a pipeline bug — null, never a
    // plausible-looking score over the shared prefix
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemType(left) == FloatType) s"(double) $a.getFloat(i)"
                 else s"$a.getDouble(i)"
      val getB = if (elemType(right) == FloatType) s"(double) $b.getFloat(i)"
                 else s"$b.getDouble(i)"
      s"""
        |int n = $a.numElements();
        |if (n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double dot = 0.0, na = 0.0, nb = 0.0;
        |  for (int i = 0; i < n; i++) {
        |    double x = $getA;
        |    double y = $getB;
        |    dot += x * y; na += x * x; nb += y * y;
        |  }
        |  if (na == 0.0 || nb == 0.0) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (Spark 4 Column wraps ColumnNode, so the
    * classic bridge converts to/from Catalyst expressions).
    */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
