package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `tables` hyperplane-LSH bucket ids of an embedding in ONE native
  * pass: per element a micro-scaled integer component
  * round(x·10⁶) (half away from zero — Spark's `round` rule, which the
  * DuckDB oracle shares), then for each of `tables`·`k` planes the
  * EXACT integer dot-product sign against deterministic ±1 weights
  * (LCG on the global (plane·dim + index) — identical to
  * `ops.Similarity.planeWeights`, which renders the same weights into
  * the oracle SQL). Sign bits pack little-endian into an int per table.
  *
  * Why a native Expression (preference (b) of the build brief): the HOF
  * formulation re-evaluates the scaled-component lambda once PER PLANE
  * — higher-order functions sit outside Spark's common-subexpression
  * elimination, so 24 planes recompute the same 64 round+cast elements
  * 24×, measured ~4x slower end-to-end on the near-dup query. Here the
  * scaling runs once and the plane loop is branch-free integer
  * arithmetic; weights are precomputed per Expression instance.
  *
  * Exactness contract: integer dot products are summation-order
  * independent, so the bucket of a vector is identical in any engine —
  * this is what lets the LSH query family sit behind the driver's full
  * DuckDB hash gate.
  */
case class HyperplaneBuckets(child: Expression, k: Int, tables: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= 31 && tables >= 1, s"k=$k, tables=$tables out of range")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float>, got ${t.sql}")
  }

  /** ±1 weights for global plane p at element j, flattened [p * dim + j]. */
  @transient private lazy val weights: Array[Long] = {
    val w = new Array[Long](tables * k * dim)
    var idx = 0
    while (idx < w.length) {
      val x = idx * 6364136223846793005L + 1442695040888963407L
      w(idx) = if (((x >>> 33) & 1L) == 1L) 1L else -1L
      idx += 1
    }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sx = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = arr.getFloat(j).toDouble * 1000000d
      // HALF_UP away from zero, exactly (v is exact: 24-bit float
      // mantissa x 10^6 needs <= 44 significand bits, so v +- 0.5 and
      // floor/ceil introduce no rounding of their own); the magnitude
      // guard keeps the ±1-dot sums inside int64 (same bound as the t̂
      // space — see UnitScaledInts.MaxComponent)
      sx(j) = UnitScaledInts.checkComponent(
        (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong)
      j += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < k) {
        val base = (t * k + p) * dim
        var s = 0L
        j = 0
        val lim = math.min(n, dim)
        while (j < lim) { s += sx(j) * weights(base + j); j += 1 }
        if (s > 0L) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point (same bridge pattern as CosineSimilarity). */
  def buckets(vec: Column, k: Int, tables: Int, dim: Int): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(vec), k, tables, dim))
}
