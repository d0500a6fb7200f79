package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r17): the physical plan of one fused pre/post
  * pivot — join strategy, exchange count, partition sizing. */
object PivotPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, struct}
    val t = graft.ops.Lake.morCdcTable(spark, sfDir)
    val c = t.log.commitIfExists(2L).get
    val deltaPaths = c.adds.filter(_.isDelta).map(_.path)
    val fileSchema = t.parseSchema(c.schemaJson)
    val keys = spark.read.schema(fileSchema).parquet(deltaPaths: _*)
      .select(t.config.keyCols.map(n => col("`" + n + "`")): _*)
    val liveAt = t.log.liveFiles(Some(2L))
    println(s"[pivot] candidates=${liveAt.size} files, " +
      s"bytes=${liveAt.map(_.bytes).sum}")
    def pay(df: org.apache.spark.sql.DataFrame) = struct(df.columns
      .filterNot(Set("_win_post", "_win_pre", "_seq", "_deleted").contains)
      .map(col).toSeq: _*)
    val byKey = t.mergedPrePostPivot(liveAt, keys, 2L, pay)
    println(byKey.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
