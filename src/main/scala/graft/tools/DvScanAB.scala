package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for reads over a table with LIVE deletion vectors —
  * the measured half of the DV-native-scan claim (plan shape lives in
  * NativeScanSpec). Three states of the SAME query stack:
  *
  *   1. `clean`     — no DV: the native scan's pure-columnar baseline;
  *   2. `dv_native` — live DVs through the native path (per-split
  *      row-based partitions, vectorized decode + position anti-filter);
  *   3. `dv_v1`     — the same DV'd snapshot through the V1 fallback
  *      (`spark.graft.nativeScan.enabled=false`) — what EVERY DV'd read
  *      paid before the native path learned to apply sidecars;
  *   4. `folded`    — after foldDvs(): the table converges back to the
  *      columnar baseline (the self-healing claim).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.DvScanAB"
  */
object DvScanAB {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mult = sys.env.getOrElse("SPARK_GRAFT_AB_MULT", "10").toInt
    val tag = s"${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val wh = s"/tmp/graft_dvscanab/$tag"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.dvab", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvab.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvab.db")
    graft.Tables.lineitem(spark, base).createOrReplaceTempView("dvab_li_src")
    spark.sql("""CREATE TABLE dvab.db.li (
        pk BIGINT, l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING,
        l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
        update_ts INT)
      USING graft PARTITIONED BY (l_returnflag)
      TBLPROPERTIES (keyCols='pk', precombineCol='update_ts',
        statsCols='pk', deleteMode='dv')""")
    spark.sql(s"""INSERT INTO dvab.db.li
      SELECT (l_orderkey * 10 + l_linenumber) * $mult + r.pos,
             l_orderkey, l_linenumber,
             l_returnflag, CAST(l_quantity AS DOUBLE),
             CAST(l_extendedprice AS DOUBLE), CAST(l_discount AS DOUBLE), 0
      FROM dvab_li_src
      LATERAL VIEW posexplode(sequence(1, $mult)) r AS pos, x""")

    val queries = Seq(
      "full_agg" ->
        """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS q,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
           FROM dvab.db.li GROUP BY l_returnflag""",
      "filtered_agg" ->
        """SELECT count(*) AS n, round(sum(l_quantity), 2) AS q
           FROM dvab.db.li WHERE l_quantity > 40""")

    def run(state: String, nativeOn: Boolean): Unit = {
      spark.conf.set("spark.graft.nativeScan.enabled", nativeOn.toString)
      for ((name, q) <- queries) {
        var best = Double.MaxValue
        var rows = 0L
        spark.sql(q).collect() // warm
        for (_ <- 1 to 3) {
          val t0 = System.nanoTime()
          rows = spark.sql(q).collect().length.toLong
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(s"""{"dv_scan_ab":{"state":"$state","query":"$name","sec":$best,"rows":$rows}}""")
      }
      spark.conf.unset("spark.graft.nativeScan.enabled")
    }

    run("clean", nativeOn = true)

    // point-delete ~0.1% of keys, scattered across every partition
    // (Scala predicate API: modulo is not a pushable SQL DELETE filter)
    val t = graft.lake.LakeTable(spark, graft.lake.TableDescriptor
      .load(s"$wh/db/li", spark.sparkContext.hadoopConfiguration).get
      .config(s"$wh/db/li"))
    t.deleteWhereDv(org.apache.spark.sql.functions.col("pk") % 997 === 0)
    val dvs = t.log.liveDvs()
    println(s"""{"dv_scan_ab_state":{"live_dvs":${dvs.size},"positions":${dvs.map(_.rows).sum}}}""")

    run("dv_native", nativeOn = true)
    run("dv_v1", nativeOn = false)

    t.foldDvs(minRatio = 1e-9) // fold everything: back to bare columnar
    run("folded", nativeOn = true)

    spark.stop()
  }
}
