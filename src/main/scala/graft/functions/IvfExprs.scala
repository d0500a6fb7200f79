package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Exact-integer unit scaling of an embedding — the portable vector
  * space the IVF quantizer clusters in (see `ops.Similarity`'s
  * `emb_ann_ivf`). Per element:
  *
  *   sᵢ  = round(xᵢ·10⁶) half away from zero   (micro-scaled raw ints —
  *         the proven-portable LSH scaling, cf. [[HyperplaneBuckets]])
  *   n₂  = Σ sᵢ²                                (exact, order-free)
  *   t̂ᵢ  = (sᵢ·10⁶) quot floor(√n₂)             (truncating integer div)
  *
  * t̂ is a ±10⁶-scaled unit vector computed with ONE correctly-rounded
  * double op (the sqrt of an exactly-representable integer ≤ 10¹⁵) and
  * otherwise pure integer arithmetic — every step is deterministic and
  * engine-independent, so DuckDB replays it bit-for-bit and the whole
  * IVF family sits behind the driver's hash gate. Normalizing matters
  * because the quantizer serves COSINE ANN: on unit vectors euclidean
  * cells align with cosine neighborhoods (‖a−b‖² = 2−2·cos).
  *
  * Why native and not SQL HOFs: the per-row scalar √n₂ referenced
  * inside a transform() lambda gets CollapseProject-inlined and
  * re-aggregated per element — O(dim²) per row (the Text.ngramExpr
  * hazard). One pass here, O(dim).
  */
case class UnitScaledInts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unit_scaled_ints expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(UnitScaledInts.scale(arr))
  }

  override protected def withNewChildInternal(newChild: Expression): UnitScaledInts =
    copy(child = newChild)
}

object UnitScaledInts {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Scaled-component magnitude bound: |round(x·10⁶)| above this makes
    * the downstream int64 arithmetic unsound (Σs² needs n·s² ≤ 2⁶³ ⇒
    * |s| ≤ 3.8·10⁸ at 64 dims; s·10⁶ needs |s| ≤ 9.2·10¹²). 10⁸ (|x| ≤
    * 100) leaves margin for both at any realistic dim. Scala would WRAP
    * silently past the bound while DuckDB raises — a violating input
    * must be a clear engine error, not a confusing oracle divergence
    * (ADVICE r10). Embeddings are unit-ish scale; hitting this means
    * the column isn't an embedding. */
  private[graft] val MaxComponent = 100000000L

  private[graft] def checkComponent(sj: Long): Long = {
    if (sj > MaxComponent || sj < -MaxComponent)
      throw new IllegalArgumentException(
        s"unit_scaled_ints: embedding component ${sj / 1e6} exceeds |x| <= " +
          s"${MaxComponent / 1000000L} — not unit-scale data; int64 arithmetic would overflow")
    sj
  }

  def unitScaled(vec: Column): Column =
    ColumnBridge.column(UnitScaledInts(ColumnBridge.expression(vec)))

  private[graft] def scale(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val s = new Array[Long](n)
    var n2 = 0L
    var j = 0
    while (j < n) {
      val v = arr.getFloat(j).toDouble * 1000000d
      val sj = checkComponent(
        (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong)
      s(j) = sj
      n2 += sj * sj
      j += 1
    }
    val isq = math.floor(math.sqrt(n2.toDouble)).toLong
    j = 0
    while (j < n) {
      s(j) = if (isq == 0L) 0L else (s(j) * 1000000L) / isq
      j += 1
    }
    s
  }

  /** driver-side twin of [[scale]] for metadata-scale probe sets */
  private[graft] def scaleFloats(v: Seq[Float]): Array[Long] = {
    val s = new Array[Long](v.length)
    var n2 = 0L
    var j = 0
    while (j < v.length) {
      val x = v(j).toDouble * 1000000d
      val sj = checkComponent(
        (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong)
      s(j) = sj
      n2 += sj * sj
      j += 1
    }
    val isq = math.floor(math.sqrt(n2.toDouble)).toLong
    j = 0
    while (j < v.length) {
      s(j) = if (isq == 0L) 0L else (s(j) * 1000000L) / isq
      j += 1
    }
    s
  }
}

/** argmin cell over K centroid rows in exact-integer L2 — the IVF
  * assignment step, one pass per row, centroids precomputed per
  * Expression instance. Input is the [[UnitScaledInts]] t̂ array;
  * distances Σ(t̂ᵢ−cᵢ)² stay far inside int64 (|t̂|,|c| ≤ ~2·10⁶ ⇒
  * per-term ≤ 1.6·10¹³, ×64 dims ≤ 10¹⁵). Ties take the LOWEST cell id
  * (strict `<` on a low-to-high scan), mirroring the oracle's
  * row_number() ORDER BY (d2, cell).
  */
case class NearestCell(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<bigint>, got ${t.sql}")
  }

  @transient private lazy val flat: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[ArrayData].toLongArray()
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < flat.length) {
      val cw = flat(c)
      var d = 0L
      var j = 0
      val lim = math.min(t.length, cw.length)
      while (j < lim) { val df = t(j) - cw(j); d += df * df; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def nearest(tv: Column, cents: Seq[Seq[Long]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(tv), cents))
}
