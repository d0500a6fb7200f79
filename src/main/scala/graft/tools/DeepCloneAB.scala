package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for DEEP CLONE's two paths
  * ([[graft.lake.LakeTable.deepClone]]): on a clean all-base snapshot
  * the BYTE-COPY fast path moves files without decoding a row — no
  * scan, no shuffle, no parquet encode — while the rewrite fallback
  * (forced here by a live DV) pays a full read + clustered write.
  * At 100 TB the difference is copying bytes at storage bandwidth vs
  * re-encoding a table through the CPU.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          SPARK_GRAFT_AB_MULT=10 sbt "runMain graft.tools.DeepCloneAB"
  */
object DeepCloneAB {

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

    val mult = sys.env.getOrElse("SPARK_GRAFT_AB_MULT", "10").toInt
    val wh = s"/tmp/graft_deepcloneab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.dca", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dca.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dca.db")

    graft.Tables.lineitem(spark, base)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        s"posexplode(sequence(1, $mult)) AS (pos, x)")
      .selectExpr(s"l_orderkey * $mult + pos AS pk", "l_linenumber",
        "l_returnflag", "CAST(floor(l_quantity * 100) AS BIGINT) AS qty")
      .createOrReplaceTempView("dca_src")
    spark.sql("""CREATE TABLE dca.db.src (pk BIGINT, l_linenumber INT,
        l_returnflag STRING, qty BIGINT, update_ts INT) USING graft
      TBLPROPERTIES (keyCols='pk,l_linenumber', precombineCol='update_ts',
        deleteMode='dv')""")
    spark.sql("INSERT INTO dca.db.src SELECT *, 0 FROM dca_src")
    val rows = spark.sql("SELECT count(*) FROM dca.db.src").collect().head.getLong(0)
    val bytes = spark.sql("DESCRIBE DETAIL dca.db.src").collect().head
      .getAs[Long]("size_bytes")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // clean snapshot → byte-copy path
    val copySec = timed(spark.sql(
      "CREATE TABLE dca.db.clone_fast DEEP CLONE dca.db.src").collect())
    // a single DV'd key forces the rewrite path on the same data
    val minPk = spark.sql("SELECT min(pk) FROM dca.db.src").collect().head.getLong(0)
    spark.sql(s"DELETE FROM dca.db.src WHERE pk = $minPk")
    val rewriteSec = timed(spark.sql(
      "CREATE TABLE dca.db.clone_rw DEEP CLONE dca.db.src").collect())

    val n1 = spark.sql("SELECT count(*) FROM dca.db.clone_fast")
      .collect().head.getLong(0)
    val n2 = spark.sql("SELECT count(*) FROM dca.db.clone_rw")
      .collect().head.getLong(0)
    println(f"[deepcloneab] src rows=$rows bytes=${bytes / 1e6}%.0f MB")
    println(f"[deepcloneab] byte-copy fast path = $copySec%6.2f s (rows=$n1)")
    println(f"[deepcloneab] rewrite fallback    = $rewriteSec%6.2f s (rows=$n2)")
    println(f"[deepcloneab] fast-path payoff    = ${rewriteSec / copySec}%.2f x")
    spark.stop()
  }
}
