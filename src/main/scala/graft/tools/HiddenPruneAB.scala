package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, LakeTableConfig}

/** A/B measurement for hidden-partition directory pruning: the same
  * 6-month revenue aggregation over a `months(o_orderdate)` +
  * `bucket(4, o_custkey)` lake table, once through `read(pruneBy)`
  * (transform-aware file pruning) and once through `read().filter`
  * (every file listed and opened; only parquet footer stats help).
  * Prints pruned/total file counts + bytes and min-of-3 timings —
  * the measured half of the hidden-partitioning scale claim
  * (`SCALE.md` r12).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.tools.HiddenPruneAB"`
  */
object HiddenPruneAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"/tmp/graft_lake/hpab_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("o_orderkey"), precombineCol = "update_ts",
      globalIndex = true,
      partitionCols = Seq("o_orderdate", "o_custkey"),
      partitionTransforms = Seq("months", "bucket[4]")))
    t.bulkInsert(graft.Tables.orders(spark, sfDir).withColumn("update_ts", lit(0)))

    val pred = col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00")) &&
      col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-09-01 00:00:00"))

    val live = t.log.liveFiles(None)
    val pruned = t.pruneFilesFor(live, t.resolvePredicate(pred, None).get, None)
    println(s"[hpab] files total=${live.size} pruned=${pruned.size} " +
      s"bytes total=${live.map(_.bytes).sum} pruned=${pruned.map(_.bytes).sum}")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)), sum(col("o_totalprice"))).collect()
      ()
    }
    // warm both paths once, then min-of-3
    agg(t.read(pred)); agg(t.read().filter(pred))
    val withPrune = (1 to 3).map(_ => timed(agg(t.read(pred)))).min
    val noPrune = (1 to 3).map(_ => timed(agg(t.read().filter(pred)))).min
    println(f"[hpab] sec with_prune=$withPrune%.3f no_prune=$noPrune%.3f " +
      f"speedup=${noPrune / withPrune}%.2fx")
    spark.stop()
  }
}
