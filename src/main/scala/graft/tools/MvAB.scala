package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for the transparent materialized-view rewrite
  * ([[graft.sql.GraftMvRewrite]]) and the ANALYZE pass
  * ([[graft.lake.ColStats]]): a replicated lineitem-derived fact table
  * gets a SQL MATERIALIZED VIEW, then the same GROUP-BY aggregate runs
  * with the rewrite disabled (full source scan + shuffle) and enabled
  * (dimension-cardinality MV read). Also times `refresh_mv` after a
  * small delta (the O(changed keys) claim) and the one-pass ANALYZE.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          SPARK_GRAFT_AB_MULT=10 sbt "runMain graft.tools.MvAB"
  */
object MvAB {

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
    val wh = s"/tmp/graft_mvab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.mvab", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mvab.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvab.db")

    graft.Tables.lineitem(spark, base)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        s"posexplode(sequence(1, $mult)) AS (pos, x)")
      .selectExpr(s"l_orderkey * $mult + pos AS l_orderkey", "l_linenumber",
        "l_returnflag", "CAST(floor(l_quantity * 100) AS BIGINT) AS qty100")
      .createOrReplaceTempView("mvab_src")

    // hidden truncate-partitioning on the key: CoW rewrites are bounded
    // to the touched partitions, the layout a 100 TB fact table would
    // actually run (unpartitioned CoW rewrites the whole table per
    // upsert — no refresh strategy can be sub-table after that)
    spark.sql("""CREATE TABLE mvab.db.fact (l_orderkey BIGINT, l_linenumber INT,
        l_returnflag STRING, qty100 BIGINT, update_ts INT) USING graft
      PARTITIONED BY (truncate(100000, l_orderkey))
      TBLPROPERTIES (keyCols='l_orderkey,l_linenumber', precombineCol='update_ts',
        globalIndex='true')""")
    var t0 = System.nanoTime()
    spark.sql("INSERT INTO mvab.db.fact SELECT *, 0 FROM mvab_src")
    val seedSec = (System.nanoTime() - t0) / 1e9
    val rows = spark.sql("SELECT count(*) AS c FROM mvab.db.fact").collect().head.getLong(0)

    t0 = System.nanoTime()
    spark.sql("""CREATE MATERIALIZED VIEW mvab.db.fact_mv AS
      SELECT l_returnflag, count(*) AS n, sum(qty100) AS total,
             min(qty100) AS lo, max(qty100) AS hi
      FROM mvab.db.fact GROUP BY l_returnflag""")
    val buildSec = (System.nanoTime() - t0) / 1e9
    // invertible-only twin: its refresh needs NO order-statistics
    // recompute probe, so it isolates the windowed adds/subs cost
    spark.sql("""CREATE MATERIALIZED VIEW mvab.db.fact_mv_sum AS
      SELECT l_returnflag, count(*) AS n, sum(qty100) AS total
      FROM mvab.db.fact GROUP BY l_returnflag""")

    val q = """SELECT l_returnflag, count(*) AS n, sum(qty100) AS total,
               min(qty100) AS lo, max(qty100) AS hi
               FROM mvab.db.fact GROUP BY l_returnflag"""
    def time3(label: String, rewrite: Boolean): Double = {
      spark.conf.set("spark.graft.mvRewrite", rewrite.toString)
      try {
        val times = (1 to 3).map { _ =>
          val s = System.nanoTime()
          spark.sql(q).collect()
          (System.nanoTime() - s) / 1e9
        }
        val best = times.min
        println(f"[mvab] $label%-28s min-of-3 = $best%.3f s")
        best
      } finally spark.conf.unset("spark.graft.mvRewrite")
    }
    val off = time3("aggregate, rewrite OFF", rewrite = false)
    val on = time3("aggregate, rewrite ON", rewrite = true)

    // delta: a CONTIGUOUS ~0.2% key slice (the realistic CDC shape —
    // hot keys cluster; a delta spread across every file group rewrites
    // the whole table at WRITE time and no refresh strategy can be
    // sub-table after that), then refresh — cost must track the touched
    // file groups, not the table
    val maxKey = spark.sql("SELECT max(l_orderkey) FROM mvab.db.fact")
      .collect().head.getLong(0)
    val lim = math.max(maxKey / 500, 1L)
    spark.sql(s"""INSERT INTO mvab.db.fact
      SELECT l_orderkey, l_linenumber, l_returnflag, qty100 + 7, 1
      FROM mvab_src WHERE l_orderkey <= $lim""")
    t0 = System.nanoTime()
    spark.sql("CALL mvab.system.refresh_mv('db.fact_mv')").collect()
    val refreshSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    spark.sql("CALL mvab.system.refresh_mv('db.fact_mv_sum')").collect()
    val refreshSumSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    spark.sql("CALL mvab.system.analyze('db.fact')").collect()
    val analyzeSec = (System.nanoTime() - t0) / 1e9
    val statsBytes = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      s"$wh/db/fact/_log/_colstats.json")).getLen

    println(f"[mvab] rows=$rows seed=$seedSec%.1f s mv_build=$buildSec%.1f s")
    println(f"[mvab] agg rewrite off=$off%.3f s on=$on%.3f s speedup=${off / on}%.1f x")
    println(f"[mvab] delta_refresh minmax=$refreshSec%.1f s sum_only=$refreshSumSec%.1f s analyze=$analyzeSec%.1f s stats_artifact=$statsBytes%d B")
    spark.stop()
  }
}
