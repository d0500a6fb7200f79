package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for the DSv2 native batch read path vs the V1
  * fallback over the SAME lake table — the measured half of the
  * native-scan claim (the plan-shape half lives in NativeScanSpec).
  * The toggle is the escape hatch the scan builder honors
  * (`spark.graft.nativeScan.enabled`), so both runs execute identical
  * queries through identical pruning metadata; only the physical read
  * path differs (columnar vectorized batch vs RDD[Row] double
  * conversion).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.ScanAB"
  * Prints one JSON line per (query, mode) with min-of-3 seconds and a
  * final ratio line per query.
  */
object ScanAB {

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

    // row-replication multiplier: per-row read costs (the conversion tax
    // the native path removes) only dominate once the data outweighs
    // per-query planning overhead — the regime a real table lives in
    val mult = sys.env.getOrElse("SPARK_GRAFT_AB_MULT", "10").toInt
    val wh = s"/tmp/graft_scanab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    spark.conf.set("spark.sql.catalog.ab", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.ab.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ab.db")
    val exists = scala.util.Try(
      spark.sql("SELECT 1 FROM ab.db.li LIMIT 1").count()).isSuccess
    if (!exists) {
      graft.Tables.lineitem(spark, base).createOrReplaceTempView("ab_li_src")
      spark.sql("""CREATE TABLE ab.db.li (
          pk BIGINT, l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING,
          l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
          update_ts INT)
        USING graft PARTITIONED BY (l_returnflag)
        TBLPROPERTIES (keyCols='pk', precombineCol='update_ts', statsCols='pk')""")
      spark.sql(s"""INSERT INTO ab.db.li
        SELECT (l_orderkey * 10 + l_linenumber) * $mult + r.pos,
               l_orderkey, l_linenumber,
               l_returnflag, CAST(l_quantity AS DOUBLE),
               CAST(l_extendedprice AS DOUBLE), CAST(l_discount AS DOUBLE), 0
        FROM ab_li_src
        LATERAL VIEW posexplode(sequence(1, $mult)) r AS pos, x""")
    }

    val queries = Seq(
      "full_agg" ->
        """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS q,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
           FROM ab.db.li GROUP BY l_returnflag""",
      "filtered_agg" ->
        """SELECT count(*) AS n, round(sum(l_quantity), 2) AS q
           FROM ab.db.li WHERE l_returnflag = 'R' AND l_quantity > 40""",
      "point_key" ->
        "SELECT * FROM ab.db.li WHERE pk = 19975")

    val results = scala.collection.mutable.LinkedHashMap[(String, String), Double]()
    for (mode <- Seq("true", "false"); (name, q) <- queries) {
      spark.conf.set("spark.graft.nativeScan.enabled", mode)
      var best = Double.MaxValue
      var rows = 0L
      spark.sql(q).collect() // warm: page cache + codegen + fixture state
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = spark.sql(q).collect().length.toLong
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      results((name, mode)) = best
      println(s"""{"scan_ab":{"query":"$name","native":$mode,"sec":$best,"rows":$rows}}""")
    }
    spark.conf.unset("spark.graft.nativeScan.enabled")
    for ((name, _) <- queries) {
      val n = results((name, "true")); val v1 = results((name, "false"))
      println(f"""{"scan_ab_ratio":{"query":"$name","native_sec":$n%.3f,"v1_sec":$v1%.3f,"speedup":${v1 / n}%.2f}}""")
    }
    spark.stop()
  }
}
