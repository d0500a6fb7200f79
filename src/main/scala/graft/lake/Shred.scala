package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, GetJsonObject, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.functions.{col, get_json_object, try_variant_get}
import org.apache.spark.sql.types.{DataType, StringType, StructType, VariantType}

/** One VARIANT / JSON shredding entry ([[LakeTableConfig.shredPaths]]):
  * `column` is a VARIANT or JSON-string column of the table, `path` a
  * JSON path (`$.user.id`), `dt` the extraction type. The Parquet
  * variant-shredding / Iceberg v3 idea re-expressed Spark-first: the
  * write path materializes `expr` as a typed shadow column in the
  * physical files (invisible to readers — explicit-schema scans never
  * select it) whose per-file min/max land in the commit log; the read
  * path rewrites a predicate's matching extraction sub-expressions to
  * the shadow column so ordinary stats skipping prunes files BEFORE any
  * variant byte is decoded.
  *
  * The shadow name is a content hash of (column, path, type): stable
  * under config reordering, and an ALTERed entry simply mints a new
  * name — files written under the old entry carry no stat for it and
  * are conservatively kept.
  *
  * Extraction semantics are the TRY forms (`try_variant_get`;
  * `get_json_object` + try-cast): a row whose value cannot cast yields
  * a NULL shadow. Consequence (documented contract): a predicate using
  * the STRICT `variant_get` prunes identically on well-typed data, but
  * a file whose rows would have RAISED the strict cast error can be
  * skipped instead of raising — stats pruning answers "provably no
  * match", not "would any row error".
  */
final case class ShredSpec(column: String, path: String, dt: DataType) {

  /** shadow column name — content-addressed, never user-colliding by
    * the reserved `_shred_` prefix (enforced at write) */
  val name: String = "_shred_" + {
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$column:$path:${dt.catalogString}".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
  }

  /** the materialized extraction over a write batch; None when the
    * batch does not carry `column` (e.g. key-only tombstone deltas) or
    * carries it with an unshreddable type */
  def shadowColumn(schema: StructType): Option[Column] =
    schema.fields.find(_.name == column).map(_.dataType).flatMap {
      case _: VariantType => Some(try_variant_get(col(column), path, dt.sql))
      case StringType =>
        Some(get_json_object(col(column), path).try_cast(dt.sql))
      case _ => None
    }

  /** does `e` compute exactly this entry's extraction over the source
    * column? Matches the VARIANT forms (variant_get / try_variant_get)
    * and the JSON-string forms (get_json_object, bare when dt=string,
    * cast otherwise — any cast eval mode: TRY differs from strict only
    * by error suppression, which stats pruning cannot observe). */
  def matches(e: Expression): Boolean = e match {
    case vg: VariantGet =>
      vg.dataType == dt && isPathLit(vg.right) && isCol(vg.left)
    case c: Cast =>
      c.dataType == dt && matchesGjo(c.child)
    case other => dt == StringType && matchesGjo(other)
  }

  private def matchesGjo(e: Expression): Boolean = e match {
    case g: GetJsonObject => isCol(g.json) && isPathLit(g.path)
    case _ => false
  }

  private def isCol(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == column
    case _ => false
  }

  private def isPathLit(e: Expression): Boolean = e match {
    case Literal(v, StringType) => String.valueOf(v) == path
    case _ => false
  }

  /** the stats-pruning stand-in: an attribute named like the shadow
    * column, typed like the extraction */
  def shadowAttr: AttributeReference = AttributeReference(name, dt)()
}

object ShredSpec {

  /** `column:$.json.path:type` — the column is everything before the
    * FIRST ':', the type everything after the LAST ':' (JSON paths
    * contain neither). */
  def parse(entry: String): ShredSpec = {
    val first = entry.indexOf(':')
    val last = entry.lastIndexOf(':')
    require(first > 0 && last > first && last < entry.length - 1,
      s"malformed shredPaths entry '$entry' — want column:$$.path:type")
    val column = entry.substring(0, first).trim
    val path = entry.substring(first + 1, last).trim
    val dt = org.apache.spark.sql.types.DataType.fromDDL(
      entry.substring(last + 1).trim)
    require(path.startsWith("$"),
      s"shredPaths path must be a JSON path starting with $$, got '$path'")
    ShredSpec(column, path, dt)
  }

  /** Append every applicable shadow column to a write batch. Fails loud
    * on a user column squatting the reserved prefix. */
  def appendShadows(df: DataFrame, specs: Seq[ShredSpec]): DataFrame = {
    if (specs.isEmpty) return df
    val squatters = df.columns.filter(_.startsWith("_shred_"))
    require(squatters.isEmpty,
      s"'_shred_' column names are reserved for shredding shadows: " +
        squatters.mkString(", "))
    specs.foldLeft(df) { (acc, s) =>
      s.shadowColumn(df.schema).fold(acc)(c => acc.withColumn(s.name, c))
    }
  }

  /** Rewrite every matching extraction sub-expression of a pruning
    * predicate to its shadow attribute — the result is only ever fed to
    * the stats comparator (never executed), so the dangling attribute is
    * safe by construction. */
  def rewritePred(pred: Expression, specs: Seq[ShredSpec]): Expression =
    if (specs.isEmpty) pred
    else pred.transformUp {
      case e if specs.exists(_.matches(e)) =>
        specs.find(_.matches(e)).get.shadowAttr
    }
}
