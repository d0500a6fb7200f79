package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** A/B diagnostic for the maintenance recluster drift trigger
  * ([[graft.lake.Maintenance.Policy.reclusterDriftRatio]]) — the
  * measured half of the clustering-erosion claim (trigger semantics
  * live in MaintenanceSpec). One table, three states of the same
  * stats-pruned point query:
  *
  *   1. `clustered` — one range-ordered bulk load: the skipping baseline;
  *   2. `eroded`    — MoR delta upserts accumulated (deltas skip the
  *      clustering shuffle by design), so every point read pays one
  *      extra file per write batch;
  *   3. `reclustered` — the policy noticed the drift and fired
  *      `recluster()`: files-read and latency return to the baseline.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.ReclusterAB"
  */
object ReclusterAB {

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
    val erosions = sys.env.getOrElse("SPARK_GRAFT_AB_EROSIONS", "8").toInt
    val root = s"/tmp/graft_reclusterab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    import graft.lake.{LakeTable, LakeTableConfig, Maintenance}
    val t = LakeTable(spark, LakeTableConfig(root,
      keyCols = Seq("pk"), precombineCol = "update_ts",
      statsCols = Seq("l_orderkey"), clusterCols = Seq("l_orderkey"),
      storageType = "mor"))

    // the synthetic lineitem is NOT key-unique on (okey, lnum) —
    // collapse first so every derived pk is unique (bulk load contract)
    graft.Tables.lineitem(spark, base)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(org.apache.spark.sql.functions.max("l_quantity").as("l_quantity"))
      .createOrReplaceTempView("rab_src")
    val seed = spark.sql(s"""
      SELECT (l_orderkey * 10 + l_linenumber) * $mult + r.pos AS pk,
             l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty,
             0 AS update_ts
      FROM rab_src LATERAL VIEW posexplode(sequence(1, $mult)) r AS pos, x""")
    t.bulkInsert(seed)

    val maxKey = spark.sql("SELECT max(l_orderkey) FROM rab_src")
      .collect().head.getLong(0)
    def probe(state: String): Unit = {
      val q = t.read(col("l_orderkey") === maxKey / 2)
      q.count() // warm
      var best = Double.MaxValue
      var nFiles = 0
      var rows = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val d = t.read(col("l_orderkey") === maxKey / 2)
        rows = d.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        nFiles = d.inputFiles.length
      }
      println(s"""{"recluster_ab":{"state":"$state","files":$nFiles,"sec":$best,"rows":$rows}}""")
    }

    probe("clustered")

    // erosion: delta upserts spanning the whole key range, one per batch
    (1 to erosions).foreach { k =>
      val upd = spark.sql(s"""
        SELECT (l_orderkey * 10 + l_linenumber) * $mult + 1 AS pk,
               l_orderkey, l_linenumber, CAST(l_quantity + $k AS DOUBLE) AS qty,
               $k AS update_ts
        FROM rab_src WHERE l_orderkey % 50 = $k""")
      t.upsert(upd)
    }
    probe("eroded")

    val fired = Maintenance.run(t, Maintenance.Policy(reclusterDriftRatio = 0.02))
    println(s"""{"recluster_ab_maint":${fired.map(a => "\"" + a._1 + "\"").mkString("[", ",", "]")}}""")
    probe("reclustered")

    spark.stop()
  }
}
