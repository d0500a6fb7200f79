package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for plan-time skew-join mitigation
  * ([[graft.sql.GraftSkewJoinRule]]): a fact whose string join key puts
  * half its mass on ONE value joins a dimension that sits ABOVE the
  * auto-broadcast threshold. Catalyst alone plans a sort-merge shuffle
  * whose hot key serializes one reducer (AQE's skew split mitigates at
  * runtime, after the skewed shuffle files exist); the frequent-items
  * stats prove the hot key at plan time, so the rule either
  * force-broadcasts the dim (no shuffle at all) or salts the hot key
  * across reducers. Measures all four corners: {rule off, rule on} ×
  * {broadcast-eligible dim, broadcast-fenced (salting)}.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          SPARK_GRAFT_AB_MULT=10 sbt "runMain graft.tools.SkewJoinAB"
  */
object SkewJoinAB {

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
    val wh = s"/tmp/graft_skewjoinab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    spark.conf.set("spark.sql.catalog.sj", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sj.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sj.db")

    // fact ×mult: 'HOT' owns half the join key mass, the rest spreads
    // over 5k values (inside the frequent-items NDV cap)
    graft.Tables.lineitem(spark, base)
      .selectExpr("l_orderkey", "l_linenumber", "l_quantity",
        s"posexplode(sequence(1, $mult)) AS (pos, x)")
      .selectExpr(s"l_orderkey * $mult + pos AS pk", "l_linenumber",
        "CASE WHEN l_orderkey % 2 = 0 THEN 'HOT' " +
          "ELSE concat('k', l_orderkey % 5000) END AS k",
        "CAST(floor(l_quantity * 100) AS BIGINT) AS qty")
      .createOrReplaceTempView("sj_src")
    spark.sql("""CREATE TABLE sj.db.fact (pk BIGINT, l_linenumber INT,
        k STRING, qty BIGINT, update_ts INT) USING graft
      TBLPROPERTIES (keyCols='pk,l_linenumber', precombineCol='update_ts')""")
    spark.sql("INSERT INTO sj.db.fact SELECT *, 0 FROM sj_src")
    val rows = spark.sql("SELECT count(*) FROM sj.db.fact").collect().head.getLong(0)

    // dim: 50k keys with an INCOMPRESSIBLE pad (per-row sha2 chains —
    // a constant pad RLE-compresses to nothing and the on-disk bytes
    // would auto-broadcast) past the 10 MB auto threshold but inside
    // the rule's 64 MB skew budget
    spark.sql("""CREATE TABLE sj.db.dim (k STRING, update_ts INT,
        w BIGINT, pad STRING) USING graft
      TBLPROPERTIES (keyCols='k', precombineCol='update_ts')""")
    spark.sql("""INSERT INTO sj.db.dim
      SELECT concat('k', id) AS k, 0, id % 97 AS w,
        concat(sha2(cast(id AS string), 512),
               sha2(cast(id * 31 AS string), 512),
               sha2(cast(id * 131 AS string), 512),
               sha2(cast(id * 1031 AS string), 512)) AS pad
      FROM range(0, 50000)
      UNION ALL SELECT 'HOT', 0, 1, sha2('hot', 512)""")
    spark.sql("CALL sj.system.analyze('db.fact')").collect()

    val q = """SELECT sum(f.qty * d.w) AS total
               FROM sj.db.fact f JOIN sj.db.dim d ON f.k = d.k"""

    def time3(): Double =
      (1 to 3).map { _ =>
        val s = System.nanoTime(); spark.sql(q).collect()
        (System.nanoTime() - s) / 1e9
      }.min
    def phase(label: String, confs: (String, String)*): Double = {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      val shape =
        if (plan.contains("BroadcastHashJoin")) "broadcast"
        else if (plan.contains("__graft_salt_")) "salted-shuffle"
        else "shuffle"
      val t = time3()
      confs.foreach { case (c, _) => spark.conf.unset(c) }
      println(f"[skewjoinab] $label%-34s = $t%7.3f s  ($shape)")
      t
    }

    println(s"[skewjoinab] fact rows=$rows (50% on one key), dim ~20 MB")
    val offB = phase("rule off, dim above auto-bcast",
      "spark.graft.skewJoin.enabled" -> "false")
    val onB = phase("rule on  -> broadcast override")
    val offS = phase("rule off, broadcast fenced (AQE only)",
      "spark.graft.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val onS = phase("rule on  -> hot-key salting",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.graft.skewJoin.broadcastMax" -> "1")
    println(f"[skewjoinab] broadcast payoff = ${offB / onB}%.2f x, " +
      f"salting payoff = ${offS / onS}%.2f x")
    spark.stop()
  }
}
