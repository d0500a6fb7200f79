package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate over a [[LakeTable]] — the
  * materialized-view role (Hudi/Delta users hand-roll this with CDF;
  * here it is a first-class object): `count(*)` plus user sum
  * expressions per dimension tuple, refreshed from timeline deltas
  * instead of recomputation.
  *
  * Maintenance math: for a refresh window (from, to],
  *   adds = rows of snapshot(to) ingested after `from` (post-images),
  *   subs = rows of snapshot(from) whose key was updated or deleted in
  *          the window (pre-images, found by a key semi-join),
  *   delta(dim) = agg(adds) - agg(subs),
  * and the new aggregate row is old + delta, upserted; dimensions whose
  * count reaches zero are deleted. Cost is O(changed keys + affected
  * dimensions) — never a rescan of the source — which is the entire
  * point at 100 TB: a CDC trickle refreshes a dashboard aggregate in
  * seconds regardless of table size.
  *
  * The aggregate itself IS a LakeTable (keyed by the dimensions,
  * versioned by the applied source commit), so it inherits snapshot
  * isolation, time travel, and concurrency guards; the applied-commit
  * watermark rides the same atomic-rename discipline as every commit.
  *
  * Exactness: supply INTEGER-VALUED sum expressions (scale decimals
  * first, e.g. `CAST(floor(x * 100) AS BIGINT)`) so incremental
  * add/subtract is exact; float sums would drift from a direct
  * aggregation by accumulation order.
  */
final class MaterializedAgg(
    spark: SparkSession,
    source: LakeTable,
    aggRoot: String,
    dims: Seq[String],
    sums: Map[String, String]) {
  require(dims.nonEmpty, "need at least one dimension column")

  val table: LakeTable = LakeTable(spark, LakeTableConfig(
    aggRoot, keyCols = dims, precombineCol = "_src_commit"))

  // applied-watermark discipline: one EMPTY marker file per applied
  // source commit, atomically created under its own name (the CommitLog
  // pattern). Never a rename onto an existing path — Hadoop filesystems
  // fail that rename, which would freeze the watermark and silently
  // re-apply every delta on the next refresh.
  private val markerDir = new Path(aggRoot, "_log")
  private def fs = markerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** source commit id the aggregate currently reflects (None = never built) */
  def applied: Option[Long] =
    if (!fs.exists(markerDir)) None
    else fs.listStatus(markerDir).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("applied-\\d{8,}"))
      .map(_.stripPrefix("applied-").toLong)
      .maxOption

  private def record(id: Long): Unit = {
    fs.mkdirs(markerDir)
    fs.create(new Path(markerDir, f"applied-$id%08d"), true).close()
    // older markers are redundant once a newer one exists (best-effort)
    applied.foreach { latest =>
      fs.listStatus(markerDir).toSeq.map(_.getPath)
        .filter(p => p.getName.matches("applied-\\d{8,}") &&
          p.getName.stripPrefix("applied-").toLong < latest)
        .foreach(p => try fs.delete(p, false) catch { case _: Exception => () })
    }
  }

  private def sumCols = sums.keys.toSeq.sorted
  private def measures = "n_rows" +: sumCols

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(expr(sums(c))).as(c)): _*)

  /** Bring the aggregate up to `upTo` (default: the source head).
    * First call materializes from the snapshot; later calls apply
    * timeline deltas only. Returns the source commit now reflected.
    */
  def refresh(upTo: Option[Long] = None): Option[Long] = {
    val to = upTo.orElse(source.log.latestId).getOrElse(return None)
    val from = applied.getOrElse(-1L)
    require(to >= from, s"cannot refresh backwards: applied=$from, asked=$to")
    if (to == from) return Some(to)
    if (from < 0) {
      table.bulkInsert(aggOf(source.readAsOf(to))
        .withColumn("_src_commit", lit(to)))
      record(to); return Some(to)
    }
    val keyed = (source.config.partitionCols ++ source.config.keyCols).distinct
    val newSnap = source.readAsOf(to)
    val oldSnap = source.readAsOf(from)
    val adds = newSnap.filter(col("_commit_id") > from)
    // pre-images to retract: old rows whose key was touched in the
    // window — rewritten (it appears among adds) or deleted (gone from
    // the new snapshot). Both key probes are column-pruned.
    val touchedKeys = adds.select(keyed.map(col): _*)
      .union(oldSnap.select(keyed.map(col): _*)
        .except(newSnap.select(keyed.map(col): _*)))
      .distinct()
    val subs = oldSnap.join(touchedKeys, keyed, "left_semi")
    val dAdd = aggOf(adds)
    val dSub = aggOf(subs)
    // delta = add - sub per dimension (full outer: a dim may only shrink
    // or only grow in the window)
    val a = dAdd.select(dims.map(col) ++ measures.map(c => col(c).as(s"_a_$c")): _*)
    val b = dSub.select(dims.map(col) ++ measures.map(c => col(c).as(s"_s_$c")): _*)
    val delta = a.join(b, dims, "full_outer")
      .select(dims.map(col) ++ measures.map(c =>
        (coalesce(col(s"_a_$c"), lit(0L)) - coalesce(col(s"_s_$c"), lit(0L)))
          .as(s"_d_$c")): _*)
    // apply to the current aggregate rows of the affected dims
    val cur = table.read()
      .select(dims.map(col) ++ measures.map(col): _*)
      .join(delta.select(dims.map(col): _*), dims, "left_semi")
    val c = cur.select(dims.map(col) ++ measures.map(cc => col(cc).as(s"_c_$cc")): _*)
    val merged = delta.join(c, dims, "left_outer")
      .select(dims.map(col) ++ measures.map(cc =>
        (coalesce(col(s"_c_$cc"), lit(0L)) + col(s"_d_$cc")).as(cc)): _*)
    val gone = merged.filter(col("n_rows") <= 0).select(dims.map(col): _*)
    val live = merged.filter(col("n_rows") > 0)
      .withColumn("_src_commit", lit(to))
    if (!live.isEmpty) table.upsert(live)
    if (!gone.isEmpty) table.delete(gone)
    record(to)
    Some(to)
  }

  /** current aggregate: (dims..., n_rows, sum columns...) */
  def read(): DataFrame =
    table.read().select((dims ++ measures).map(col): _*)
}
