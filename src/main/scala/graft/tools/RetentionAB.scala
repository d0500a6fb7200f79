package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, LakeTableConfig}

/** A/B diagnostic for the metadata-only partition-drop DELETE vs the
  * keyed-rewrite path it replaces — the measured half of the
  * retention-delete claim (the semantics half lives in LakeTableSpec /
  * SqlCatalogSpec). Two identical tables are built per multiplier
  * (lineitem keyed rows, date-bucketed partitions); one takes
  * `deleteWhere(partition < cutoff)` through the fast path, the other is
  * forced onto the rewrite by an equivalent predicate the prover
  * refuses (`partition < cutoff OR quantity < 0` — same matching rows,
  * but it references a data column). The claim under test: the fast
  * path's cost is O(live files) DRIVER work and does not grow with the
  * doomed data's volume, while the rewrite reads and re-writes it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.RetentionAB 1 10"
  * Prints one JSON line per (mode, mult) and a ratio line per mult.
  */
object RetentionAB {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mults = (if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)).sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (m <- mults) {
      // m× replica by key offset: row volume grows exactly m×, the
      // partition COUNT stays fixed (10 day-buckets) — the retention
      // shape, where each partition grows with ingest volume
      val li = graft.Tables.lineitem(spark, base)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val rep = (0 until m).map(r => li.withColumn("l_orderkey",
        col("l_orderkey") + lit(r.toLong * 100000000L)))
        .reduce(_ unionByName _)
        .withColumn("day_bucket", pmod(col("l_orderkey"), lit(10)).cast("int"))
        .withColumn("update_ts", lit(0))
        .persist()
      rep.count()

      def build(tag: String): LakeTable = {
        val root = s"/tmp/graft_retab/${tag}_x$m"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val t = LakeTable(spark, LakeTableConfig(root,
          keyCols = Seq("l_orderkey", "l_linenumber"),
          precombineCol = "update_ts", partitionCols = Seq("day_bucket")))
        t.bulkInsert(rep)
        t
      }

      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }

      val fast = build("fast")
      val fastSec = timed {
        val cid = fast.deleteWhere(col("day_bucket") < 4)
        val c = fast.log.commitsInRange(cid - 1, cid).head
        require(c.adds.isEmpty &&
          c.metadata.get("delete.metadataOnly").contains("true"),
          "expected the metadata-only path")
      }

      val slow = build("rewrite")
      val slowSec = timed {
        // same matching rows; the OR-branch references a data column so
        // the exactness prover refuses and the keyed rewrite runs
        val cid = slow.deleteWhere(
          col("day_bucket") < 4 || col("l_quantity") < 0)
        val c = slow.log.commitsInRange(cid - 1, cid).head
        require(!c.metadata.contains("delete.metadataOnly"),
          "expected the rewrite path")
      }
      require(fast.read().count() == slow.read().count(),
        "the two paths must agree")
      rep.unpersist()

      println(s"""{"retention_ab":{"mult":$m,"metadata_only_sec":$fastSec,"rewrite_sec":$slowSec,"speedup":${slowSec / fastSec}}}""")
    }
    spark.stop()
  }
}
