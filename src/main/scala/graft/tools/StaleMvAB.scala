package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for the bounded-staleness MV rewrite
  * ([[graft.sql.GraftMvRewrite]] + `maxStaleness`): on a TRICKLE-WRITTEN
  * fact table, the exact-head gate disqualifies an MV the moment any
  * commit lands, so every dashboard query between maintenance rounds
  * pays the full fact scan — the bounded-staleness MV keeps serving.
  * Measures the same-shape aggregate against (a) an exact-gate MV made
  * stale by trickle commits (falls back to the scan) and (b) a
  * `maxStaleness` MV under identical staleness (serves), plus the
  * frequent-items ANALYZE pass the r16 CBO work added.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          SPARK_GRAFT_AB_MULT=10 sbt "runMain graft.tools.StaleMvAB"
  */
object StaleMvAB {

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
    val wh = s"/tmp/graft_stalemvab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.smv", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.smv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS smv.db")

    graft.Tables.lineitem(spark, base)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        s"posexplode(sequence(1, $mult)) AS (pos, x)")
      .selectExpr(s"l_orderkey * $mult + pos AS l_orderkey", "l_linenumber",
        "l_returnflag", "CAST(floor(l_quantity * 100) AS BIGINT) AS qty100")
      .createOrReplaceTempView("smv_src")
    spark.sql("""CREATE TABLE smv.db.fact (l_orderkey BIGINT, l_linenumber INT,
        l_returnflag STRING, qty100 BIGINT, update_ts INT) USING graft
      PARTITIONED BY (truncate(100000, l_orderkey))
      TBLPROPERTIES (keyCols='l_orderkey,l_linenumber', precombineCol='update_ts',
        globalIndex='true')""")
    spark.sql("INSERT INTO smv.db.fact SELECT *, 0 FROM smv_src")
    val rows = spark.sql("SELECT count(*) FROM smv.db.fact").collect().head.getLong(0)

    // two same-cost MVs on different dims: the EXACT one answers query A
    // only while exactly fresh; the LAX one answers query B within its
    // declared staleness budget
    spark.sql("""CREATE MATERIALIZED VIEW smv.db.mv_exact AS
      SELECT l_returnflag, count(*) AS n, sum(qty100) AS total
      FROM smv.db.fact GROUP BY l_returnflag""")
    spark.sql("""CREATE MATERIALIZED VIEW smv.db.mv_lax
      TBLPROPERTIES (maxStaleness='100') AS
      SELECT l_linenumber, count(*) AS n, sum(qty100) AS total
      FROM smv.db.fact GROUP BY l_linenumber""")

    // the trickle: 3 tiny commits (~0.2% of keys each) with NO refresh —
    // the live-table regime between maintenance rounds
    val maxKey = spark.sql("SELECT max(l_orderkey) FROM smv.db.fact")
      .collect().head.getLong(0)
    (1 to 3).foreach { k =>
      spark.sql(s"""INSERT INTO smv.db.fact
        SELECT l_orderkey, l_linenumber, l_returnflag, qty100 + $k, $k
        FROM smv_src WHERE l_orderkey <= ${math.max(maxKey / 500, 1L)}""")
    }

    def time3(q: String): Double =
      (1 to 3).map { _ =>
        val s = System.nanoTime(); spark.sql(q).collect()
        (System.nanoTime() - s) / 1e9
      }.min
    val qa = """SELECT l_returnflag, count(*) AS n, sum(qty100) AS total
                FROM smv.db.fact GROUP BY l_returnflag"""
    val qb = """SELECT l_linenumber, count(*) AS n, sum(qty100) AS total
                FROM smv.db.fact GROUP BY l_linenumber"""
    val exactStale = time3(qa) // exact gate: 3 commits past -> full scan
    val laxServes = time3(qb) // within tolerance: MV answers

    // the ANALYZE with the r16 frequent-items pass (l_returnflag is the
    // categorical column it targets) — the cost of truthful string skew
    val t0 = System.nanoTime()
    spark.sql("CALL smv.system.analyze('db.fact')").collect()
    val analyzeSec = (System.nanoTime() - t0) / 1e9

    println(f"[stalemvab] rows=$rows trickle=3 commits, no refresh")
    println(f"[stalemvab] exact-gate MV (stale, falls back to scan) = $exactStale%.3f s")
    println(f"[stalemvab] maxStaleness MV (serves applied snapshot)  = $laxServes%.3f s")
    println(f"[stalemvab] staleness payoff = ${exactStale / laxServes}%.1f x")
    println(f"[stalemvab] analyze incl. frequent-items pass = $analyzeSec%.1f s")
    spark.stop()
  }
}
