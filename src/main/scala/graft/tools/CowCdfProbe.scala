package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r17): where the CoW typed change feed spends its
  * time — per-commit branch costs of the derived classification.
  * Run: `sbt "runMain graft.tools.CowCdfProbe [sfDir]"` */
object CowCdfProbe {
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
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[cowcdf] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val t = graft.ops.Lake.cdcTable(spark, sfDir)
    val head = t.log.latestId.get
    val src = new graft.sources.GraftTailSource(spark.sqlContext, t,
      t.changeFeedSchema, changeTypes = true)
    timed("typed batchFrame cold")(src.batchFrame(-1L, head).count())
    timed("typed batchFrame warm")(src.batchFrame(-1L, head).count())
    val untypedSrc = new graft.sources.GraftTailSource(spark.sqlContext, t,
      t.tailSchema)
    timed("untyped batchFrame")(untypedSrc.batchFrame(-1L, head).count())
    (0L to head).foreach(id =>
      timed(s"typed commit $id")(src.batchFrame(id - 1, id).count()))
    spark.stop()
  }
}
