package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic for the bench fixture-build phase: times each lane-1
  * build SOLO (no cross-lane contention) so a quiet-bench `builds_wall`
  * regression can be attributed — the per-entry lane times measure each
  * build UNDER whatever contention the lane mix causes, so a build that
  * "doubled" in the detail file may be unchanged code paying for a
  * heavier neighbor lane.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.BuildLaneAB"
  */
object BuildLaneAB {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[buildlaneab] $label%-20s = ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    time("warmup_scan")(graft.Tables.lineitem(spark, base).count())
    time("lake_cdc_build") { graft.ops.Lake.cdcTable(spark, base); () }
    time("incr_agg_build") { graft.ops.Lake.incrAgg(spark, base); () }
    time("incr_agg_mm_build") { graft.ops.Lake.incrAggMM(spark, base); () }
    time("sql_dml_build") { graft.ops.Sql.dmlFixture(spark, base); () }
    time("sql_merge_build") { graft.ops.Sql.mergeFixture(spark, base); () }
    spark.stop()
  }
}
