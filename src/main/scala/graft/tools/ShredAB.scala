package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B diagnostic for variant shredding ([[graft.lake.LakeTableConfig
  * .shredPaths]]): the same replicated events-derived VARIANT table
  * written twice — once with shredPaths (typed shadow stats), once
  * without — then the same `variant_get($.uid)` range predicate read
  * through both. Reports files read and min-of-3 seconds per side: the
  * shredded side must skip most files BEFORE any variant byte decodes;
  * the unshredded side decodes every row of every file.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.tools.ShredAB"
  */
object ShredAB {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mult = sys.env.getOrElse("SPARK_GRAFT_AB_MULT", "20").toInt
    val root = s"/tmp/graft_shredab/${base.replaceAll("[^A-Za-z0-9.]", "_")}_x$mult"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // events replicated mult x; uid re-spread so files (clustered by the
    // plain uid column, the natural ingest order) carry disjoint ranges
    val src = graft.Tables.events(spark, base)
      .selectExpr("event_id", "user_id", "event_type", "value",
        s"posexplode(sequence(1, $mult)) AS (pos, x)")
      .select(
        (col("event_id") * mult + col("pos")).as("id"),
        (col("user_id") * mult + col("pos")).as("uid"),
        col("event_type"), col("value"))
      .select(col("id"), col("uid"),
        parse_json(to_json(struct(col("uid"),
          struct(col("event_type").as("ty"), col("value").as("score"))
            .as("meta")))).as("ev"),
        lit(0).as("ts"))

    def mk(name: String, shred: Boolean): graft.lake.LakeTable = {
      val t = graft.lake.LakeTable(spark, graft.lake.LakeTableConfig(
        s"$root/$name", keyCols = Seq("id"), precombineCol = "ts",
        clusterCols = Seq("uid"),
        shredPaths = if (shred) Seq("ev:$.uid:bigint") else Seq.empty))
      t.bulkInsert(src)
      t
    }
    val shredded = mk("shredded", shred = true)
    val plain = mk("plain", shred = false)

    // a selective uid range: a few files' worth on the shredded side
    val maxUid = 150L * mult
    val pred = variant_get(col("ev"), "$.uid", "bigint")
      .between(lit(maxUid / 2), lit(maxUid / 2 + mult))

    for ((name, t) <- Seq("shredded" -> shredded, "plain" -> plain)) {
      var best = Double.MaxValue
      var rows = 0L
      val files = t.read(pred).inputFiles.length
      val total = t.read().inputFiles.length
      t.read(pred).collect() // warm
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = t.read(pred).select("id").collect().length.toLong
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(s"""{"shred_ab":{"table":"$name","files_read":$files,"files_total":$total,"sec":$best,"rows":$rows}}""")
    }
    spark.stop()
  }
}
