package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.sql.GraftBatchScan

/** A/B measurement for the r12 planner features whose value claim IS
  * scale — dynamic partition pruning (runtime V2 filtering) and
  * storage-partitioned joins:
  *
  *  - DPP: a fact-dim star join whose dim filter keeps 3 of 40 fact
  *    partitions, measured with runtime filtering ON vs OFF
  *    (`spark.sql.optimizer.dynamicPartitionPruning.enabled`), plus
  *    the file counts the runtime filter actually delivered
  *    (`GraftBatchScan.runtimePrunedTo` vs the static file count).
  *  - SPJ: a co-partitioned lake-lake join + group-by measured with V2
  *    bucketing ON (key-grouped, zero join shuffles) vs OFF (plain
  *    shuffle join), with the join-shuffle count asserted from the
  *    executed plan.
  *
  * Row volume scales with the multiplier argument; min-of-3 wall times.
  * Run: `sbt "runMain graft.tools.PlannerAB [multiplier]"`
  */
object PlannerAB {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("plannerab").toString
    spark.conf.set("spark.sql.catalog.pab", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pab.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pab.db")

    val nFact = 200000L * mult
    val parts = 40
    spark.sql("""CREATE TABLE pab.db.fact (pk BIGINT, ts INT, amount BIGINT,
        region STRING) USING graft PARTITIONED BY (region)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.range(nFact).createOrReplaceTempView("src")
    spark.sql(s"""INSERT INTO pab.db.fact
      SELECT id, 0, id % 1000, concat('r', CAST(id % $parts AS STRING))
      FROM src""")
    spark.sql("""CREATE TABLE pab.db.dim (region STRING, ts INT, tier STRING)
      USING graft TBLPROPERTIES (keyCols='region', precombineCol='ts')""")
    spark.sql(s"""INSERT INTO pab.db.dim
      SELECT concat('r', CAST(id AS STRING)), 0,
             CASE WHEN id < 3 THEN 'gold' ELSE 'iron' END
      FROM range($parts)""")
    // SPJ pair: co-partitioned on the join key
    spark.sql("""CREATE TABLE pab.db.spjb (pk BIGINT, ts INT, label STRING,
        region STRING) USING graft PARTITIONED BY (region)
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql(s"""INSERT INTO pab.db.spjb
      SELECT id, 0, concat('L', CAST(id AS STRING)),
             concat('r', CAST(id % $parts AS STRING))
      FROM range(${parts * 100})""")

    def walkScans(p: SparkPlan): Seq[GraftBatchScan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val buf = scala.collection.mutable.ArrayBuffer.empty[GraftBatchScan]
      def walk(n: SparkPlan): Unit = {
        n match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case b: BatchScanExec if b.scan.isInstanceOf[GraftBatchScan] =>
            buf += b.scan.asInstanceOf[GraftBatchScan]
          case _ => ()
        }
        n.children.foreach(walk)
        n.subqueries.foreach(walk)
      }
      walk(p); buf.toSeq
    }
    def joinShuffles(p: SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
      var inJoin = 0
      def walk(n: SparkPlan, underJoin: Boolean): Unit = {
        val below = underJoin || n.isInstanceOf[SortMergeJoinExec] ||
          n.isInstanceOf[ShuffledHashJoinExec]
        n match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, below)
          case q: QueryStageExec => walk(q.plan, below)
          case _: ShuffleExchangeExec if below => inJoin += 1
          case _ => ()
        }
        n.children.foreach(walk(_, below))
      }
      walk(p, underJoin = false); inJoin
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(sql: String): Double = {
      spark.sql(sql).collect() // warm
      (1 to 3).map(_ => timed(spark.sql(sql).collect())).min
    }

    // ---- DPP ------------------------------------------------------------
    val dppQ = """SELECT sum(f.amount) FROM pab.db.fact f
      JOIN pab.db.dim d ON f.region = d.region WHERE d.tier = 'gold'"""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val dppOn = minOf3(dppQ)
    val df = spark.sql(dppQ); df.collect()
    val factScan = walkScans(df.queryExecution.executedPlan)
      .find(_.description().contains("db.fact"))
    val staticFiles = spark.sql("SELECT count(*) FROM pab.db.fact.files")
      .collect().head.getLong(0)
    val prunedTo = factScan.map(_.runtimePrunedTo).getOrElse(-1)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val dppOff = minOf3(dppQ)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    // ---- SPJ ------------------------------------------------------------
    val spjQ = """SELECT a.region, sum(a.amount) AS amt, count(b.label) AS n
      FROM pab.db.fact a JOIN pab.db.spjb b ON a.region = b.region
      GROUP BY a.region"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val spjOn = minOf3(spjQ)
    val spjDf = spark.sql(spjQ); spjDf.collect()
    val spjShuffles = joinShuffles(spjDf.queryExecution.executedPlan)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val spjOff = minOf3(spjQ)
    val offDf = spark.sql(spjQ); offDf.collect()
    val offShuffles = joinShuffles(offDf.queryExecution.executedPlan)

    println(f"[plannerab] mult=$mult fact_rows=$nFact parts=$parts | " +
      f"dpp_on=$dppOn%.3f dpp_off=$dppOff%.3f ratio=${dppOff / dppOn}%.2fx " +
      f"files_static=$staticFiles runtime_pruned_to=$prunedTo | " +
      f"spj_on=$spjOn%.3f spj_off=$spjOff%.3f ratio=${spjOff / spjOn}%.2fx " +
      f"join_shuffles_on=$spjShuffles join_shuffles_off=$offShuffles")
    spark.stop()
  }
}
