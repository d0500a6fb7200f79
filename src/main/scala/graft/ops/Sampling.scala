package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `randomSplit`/`sample` are NOT reproducible at scale: their per-
  * partition RNG re-deals rows whenever partitioning, file order, or
  * parallelism changes — a re-run of a 100 TB pipeline silently moves
  * documents between train and test. The standard fix (what every large
  * corpus pipeline does) is content-addressed assignment: a salted hash
  * of a stable id decides the bucket, so membership is a pure per-row
  * function — same row, same split, on any cluster shape, forever, and
  * adding data never reshuffles existing assignments. Pure codegen'd
  * expressions: no shuffle, no UDF, no state.
  *
  * The hash is md5 (first 8 hex digits → bucket in [0, 10000)): md5 is
  * bit-identical across engines, which makes every assignment DuckDB-
  * oracle-checkable — and portable to any downstream system that wants
  * to recompute membership.
  */
object Sampling {

  val Buckets = 10000

  /** salted content-addressed bucket in [0, Buckets) */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Assign each row to a named split by cumulative weight (e.g.
    * ("train",0.8),("val",0.1),("test",0.1)). Thresholds are fixed in
    * integer bucket space, so the boundaries are exact and the
    * assignment is reproducible independently of float rounding.
    */
  def assignSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val b = hashBucket(col(idCol), salt)
    val thresholds = splits.scanLeft(0L) {
      case (acc, (_, w)) => acc + math.round(w * Buckets)
    }.tail
    val assign = splits.zip(thresholds).dropRight(1)
      .foldRight(lit(splits.last._1)) { case (((name, _), cut), acc) =>
        when(b < cut, name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Keep a per-stratum deterministic fraction of rows (downsample the
    * over-represented strata of a corpus — the language/source rebalance
    * step of a training mix). A row survives iff its salted hash bucket
    * falls below `rate(stratum) * Buckets`; unlisted strata use
    * `defaultRate`. Per-row filter, no shuffle, no sampleBy RNG drift.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "strata"): DataFrame = {
    val cut = rates.foldRight(
        lit(math.round(defaultRate * Buckets)): Column) {
      case ((stratum, rate), acc) =>
        when(col(strataCol) === stratum, math.round(rate * Buckets)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt) < cut)
  }

  // ---- fixture queries ------------------------------------------------

  /** oracle-side rendering of [[hashBucket]] (same md5/substr formula) */
  private def sqlBucket(id: String, salt: String): String =
    s"('0x' || substr(md5($id::VARCHAR || ':$salt'), 1, 8))::BIGINT % $Buckets"

  val queries: Seq[GQuery] = Seq(

    GQuery("doc_split_assign",
      (s, d) => assignSplit(
        T.documents(s, d).select(col("doc_id")), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
          CASE WHEN ${sqlBucket("doc_id", "split")} < 8000 THEN 'train'
               WHEN ${sqlBucket("doc_id", "split")} < 9000 THEN 'val'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    GQuery("doc_stratified_sample",
      (s, d) => stratifiedSample(
        T.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${sqlBucket("doc_id", "strata")} <
          CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE $Buckets END
        ORDER BY doc_id"""))
  )
}
