package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the query catalogs from graft.ops.* into the single
  * queries/oracleSql maps the driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** Every registered engine query (Spark plan + optional DuckDB oracle). */
  def all: Seq[GQuery] =
    ops.Relational.queries ++ ops.Lake.queries ++
      ops.Text.queries ++ ops.Similarity.queries ++
      ops.Multimodal.queries ++ ops.Events.queries ++ ops.Extended.queries ++
      ops.Temporal.queries ++ ops.Sampling.queries ++ ops.Prep.queries ++
      ops.Hygiene.queries ++ ops.Sql.queries ++ ops.Dedup.queries ++
      ops.Retrieval.queries ++ ops.Tokenize.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the lake CDC replay (SURVEY.md §7.2 step 2): bulk
    * insert → upsert → stale upsert, read back as a snapshot.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("lake_upsert_snapshot")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * name across modules would SILENTLY collapse in the map — one
    * query's oracle would shadow another's and the gate would count one
    * fewer check than the catalog declares — so it fails loud here. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names in the catalog: ${dups.mkString(", ")}")
    all.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case GQuery(n, _, Some(sql)) => n -> sql }.toMap
}
