package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the micro-batch DataFrame plans of the lake tail sources — the
  * computation the streaming queries time (the memory-sink read the
  * catalog entry returns is just a collected table scan, so
  * `graft.Explain` on those names shows nothing useful). Used for the
  * r17 before/after plan artifacts.
  *
  * `runMain graft.tools.TailPlans <sfDir> [cow_typed|mor_typed|mor_untyped ...]`
  */
object TailPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.tail.toSet
      else Set("cow_typed", "mor_typed", "mor_untyped")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $tag ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    if (which("mor_typed") || which("mor_untyped")) {
      val t = graft.ops.Lake.morCdcTable(spark, sfDir)
      val head = t.log.latestId.get
      if (which("mor_typed"))
        dump("mor_typed batchFrame (lake_tail_cdf_mor)",
          new graft.sources.GraftTailSource(spark.sqlContext, t,
            t.changeFeedSchema, changeTypes = true).batchFrame(-1L, head))
      if (which("mor_untyped"))
        dump("mor_untyped batchFrame (lake_tail_changes)",
          new graft.sources.GraftTailSource(spark.sqlContext, t,
            t.tailSchema).batchFrame(-1L, head))
    }
    if (which("cow_typed")) {
      val t = graft.ops.Lake.cdcTable(spark, sfDir)
      val head = t.log.latestId.get
      dump("cow_typed batchFrame (lake_tail_cdf)",
        new graft.sources.GraftTailSource(spark.sqlContext, t,
          t.changeFeedSchema, changeTypes = true).batchFrame(-1L, head))
    }
    spark.stop()
  }
}
