package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeTable, LakeTableConfig}

/** A/B write-amplification probe for deletion vectors: the SAME point
  * delete (K scattered keys) executed as (A) the CoW keyed rewrite
  * (`delete`) and (B) a position delete (`deleteDv`), at 1x/10x/...
  * replicas of the sf lineitem fixture. Reports bytes written, files
  * added, and wall time per commit — the claim under test is that B is
  * O(positions) while A is O(rewritten file bytes), so the gap widens
  * linearly with data volume. Run:
  * `sbt "runMain graft.tools.DvProbe [mult ...]"` (default 1 10). */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val baseLi = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max(col("l_returnflag")).as("l_returnflag"),
        max(col("l_quantity")).as("l_quantity"))
    val maxKey = baseLi.agg(max("l_orderkey")).collect()(0).getLong(0) + 1

    for (m <- mults) {
      val li = (0 until m).map(i => baseLi.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * maxKey))).reduce(_ union _)
        .withColumn("update_ts", lit(0)).persist()
      val nRows = li.count()
      // K scattered point-delete keys, deterministic
      val doomed = li.filter(col("l_orderkey") % 9973 === 1)
        .select("l_orderkey", "l_linenumber", "l_returnflag").persist()
      val k = doomed.count()

      def build(tag: String): LakeTable = {
        val root = s"/tmp/graft_dvprobe/${tag}_x$m"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val t = LakeTable(spark, LakeTableConfig(root,
          keyCols = Seq("l_orderkey", "l_linenumber"),
          precombineCol = "update_ts", partitionCols = Seq("l_returnflag")))
        t.bulkInsert(li)
        t
      }

      def report(tag: String, t: LakeTable, id: Long, sec: Double): Unit = {
        val c = t.log.commitIfExists(id).get
        println(s"""{"dv_probe":{"mode":"$tag","mult":$m,"rows":$nRows,""" +
          s""""deleted_keys":$k,"sec":$sec,""" +
          s""""bytes_written":${c.adds.map(_.bytes).sum},""" +
          s""""files_added":${c.adds.size},"files_removed":${c.removes.size}}}""")
      }

      val tA = build("rewrite")
      val (idA, sA) = timed(tA.delete(doomed))
      report("rewrite", tA, idA, sA)

      val tB = build("dv")
      val (idB, sB) = timed(tB.deleteDv(doomed))
      report("dv", tB, idB, sB)

      // correctness cross-check: both paths converge to the same snapshot
      val a = tA.read().select("l_orderkey", "l_linenumber", "l_quantity")
      val b = tB.read().select("l_orderkey", "l_linenumber", "l_quantity")
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"""{"dv_probe_check":{"mult":$m,"diff_rows":$diff}}""")

      // UPDATE A/B: the same point update via the merge-backed rewrite
      // vs position sidecars + new version files (updateDvWhere)
      val pred = col("l_orderkey") % 9973 === 1
      val tC = build("upd_rewrite")
      val (idC, sC) = timed {
        val src = tC.read().filter(pred)
          .withColumn("l_quantity", col("l_quantity") + 1)
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "update_ts")
        tC.merge(src)
          .whenMatchedUpdate(Map("l_quantity" -> col("s.l_quantity")))
          .execute()
      }
      report("upd_rewrite", tC, idC, sC)
      val tD = build("upd_dv")
      val (idD, sD) = timed(tD.updateDvWhere(pred,
        Map("l_quantity" -> (col("l_quantity") + 1))))
      report("upd_dv", tD, idD, sD)
      val ua = tC.read().select("l_orderkey", "l_linenumber", "l_quantity")
      val ub = tD.read().select("l_orderkey", "l_linenumber", "l_quantity")
      val udiff = ua.exceptAll(ub).count() + ub.exceptAll(ua).count()
      println(s"""{"dv_update_check":{"mult":$m,"diff_rows":$udiff}}""")
      li.unpersist(); doomed.unpersist()
    }
    spark.stop()
  }
}
