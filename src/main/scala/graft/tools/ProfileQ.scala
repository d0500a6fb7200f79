package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness for the optimization rounds:
  * `runMain graft.tools.ProfileQ <sfDir> <reps> <query> [query ...]`
  * times each named catalog query `reps` times (after one discarded cold
  * run) with the bench's own session conf and timed action (`count()`),
  * printing every sample — so an optimization's effect is measured in the
  * bench's methodology without paying the full 207-query sweep.
  *
  * Conf overrides ride env vars so A/B runs need no recompile:
  * `GRAFT_PROF_CONF="k=v;k2=v2"` is applied to the session before the
  * queries run (runtime-settable SQL confs only).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
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
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => System.err.println(
            s"[prof] skipping malformed GRAFT_PROF_CONF entry (no '='): $kv")
        }
      })
    // warmup (the bench's): touch the fact table + codegen once
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case t: Throwable =>
          System.err.println(s"[prof] $n FAILED: ${t.getMessage}"); return -1 }
        finally graft.sql.GraftSessionTxn.abortAll()
        (System.nanoTime() - t0) / 1e9
      }
      once() // cold, discarded
      val ts = (1 to reps).map(_ => once())
      println(f"[prof] $n%-28s min=${ts.min}%8.3f  runs=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
