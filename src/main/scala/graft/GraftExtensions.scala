package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions (the
  * `SparkSessionExtensions` integration point from SURVEY.md §7.3 /
  * build-brief preference (c)): after injection, plain SQL text can call
  *
  *   SELECT cosine_sim(a.embedding, b.embedding) ...
  *   SELECT winnow_fp(tokens, 3, 4) ...
  *
  * Two entry points: configure `spark.sql.extensions=graft.GraftExtensions`
  * at session build time (the standard extensions hook), or call
  * [[GraftExtensions.register]] on an existing session (registers into its
  * FunctionRegistry — used by the specs, whose session already exists).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injected.foreach(ext.injectFunction)
    GraftExtensions.injectedTableFns.foreach(ext.injectTableFunction)
    // SQL UPDATE / MERGE INTO on graft catalog tables (analyzer rules
    // cannot be added to an already-built session, so SQL DML needs the
    // session constructed with spark.sql.extensions=graft.GraftExtensions;
    // imperative register() below covers only the function surface)
    ext.injectResolutionRule(spark => sql.GraftDmlRule(spark))
    // SQL views + CREATE MATERIALIZED VIEW read/DDL resolution (the
    // DDL statements themselves are claimed at parse time below —
    // Spark 4.1's ResolveSessionCatalog rejects v2-catalog views before
    // any resolution rule could run)
    ext.injectResolutionRule(spark => sql.GraftViewRule(spark))
    ext.injectParser((_, delegate) => new sql.GraftSqlParser(delegate))
    // transparent materialized-view rewrite (fresh MVs answer matching
    // aggregates; disable with spark.graft.mvRewrite=false)
    ext.injectOptimizerRule(spark => sql.GraftMvRewrite(spark))
    // plan-time skew-join mitigation from ANALYZE frequent-items stats
    // (broadcast override or hot-key salting; disable with
    // spark.graft.skewJoin.enabled=false). Pre-CBO: scans are already
    // pushed-down DSv2 relations with commit-log-exact sizes, and join
    // reordering sees the re-shaped join.
    ext.injectPreCBORule(spark => sql.GraftSkewJoinRule(spark))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = {
    // match on the evaluated VALUE: a foldable BIGINT/SMALLINT (e.g.
    // `CAST(3 AS BIGINT)`) or NULL must produce the intended "literal int"
    // error, not a raw ClassCastException/NPE during analysis
    val v = e match {
      case Literal(x: Int, IntegerType) => x
      case other if other.foldable => other.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
        case s: java.lang.Short => s.intValue()
        case b: java.lang.Byte => b.intValue()
        case _ => throw new IllegalArgumentException(s"$what must be a literal int")
      }
      case _ => throw new IllegalArgumentException(s"$what must be a literal int")
    }
    v
  }

  private def strArg(e: Expression, what: String): String = e match {
    case other if other.foldable => other.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case _ => throw new IllegalArgumentException(s"$what must be a literal string")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal string")
  }

  // Column-composition functions: the builders return trees of catalyst
  // UnresolvedFunction nodes mirroring the DataFrame-side definitions in
  // ops.Prep / ops.Sampling — the analyzer resolves them to the same
  // codegen'd built-ins (a ColumnNode bridge does NOT work here: the
  // wrapper is opaque to resolution once inside a function builder)
  private def fn(name: String, args: Expression*): Expression =
    org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
      name, args.toSeq, isDistinct = false)
  private def dbl(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  val injected: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("redact_pii"),
      new ExpressionInfo(ops.Prep.getClass.getCanonicalName, "redact_pii"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "redact_pii(text) takes one string argument")
        // keep in lockstep with ops.Prep.redactPii
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        def rr(e: Expression, p: String, r: String) =
          fn("regexp_replace", e, Literal(p), Literal(r))
        rr(rr(rr(args(0), email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>")
      }),
    (FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(ops.Prep.getClass.getCanonicalName, "quantize_int8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quantize_int8(vec) takes one array argument")
        import org.apache.spark.sql.catalyst.expressions.{
          EqualTo, LambdaFunction, UnresolvedNamedLambdaVariable}
        val x1 = UnresolvedNamedLambdaVariable(Seq("x"))
        val m = fn("array_max",
          fn("transform", args(0), LambdaFunction(fn("abs", dbl(x1)), Seq(x1))))
        // same one-binding-per-row shape as ops.Prep.quantizeInt8 (a bare
        // `m` in the inner lambda would re-evaluate array_max per element)
        val mv = UnresolvedNamedLambdaVariable(Seq("m"))
        val x2 = UnresolvedNamedLambdaVariable(Seq("x"))
        val body = fn("if", EqualTo(mv, Literal(0.0)), Literal(0L),
          fn("floor", fn("/", fn("*", dbl(x2), Literal(127.0)), mv)))
        fn("element_at",
          fn("transform", fn("array", m),
            LambdaFunction(
              fn("transform", args(0), LambdaFunction(body, Seq(x2))),
              Seq(mv))),
          Literal(1))
      }),
    (FunctionIdentifier("hash_bucket"),
      new ExpressionInfo(ops.Sampling.getClass.getCanonicalName, "hash_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hash_bucket(id, salt) takes (column, literal string)")
        val salt = strArg(args(1), "salt")
        // keep in lockstep with ops.Sampling.hashBucket
        val h = fn("conv",
          fn("substring",
            fn("md5", fn("concat",
              org.apache.spark.sql.catalyst.expressions.Cast(
                args(0), org.apache.spark.sql.types.StringType),
              Literal(":" + salt))),
            Literal(1), Literal(8)),
          Literal(16), Literal(10))
        fn("mod",
          org.apache.spark.sql.catalyst.expressions.Cast(
            h, org.apache.spark.sql.types.LongType),
          Literal(ops.Sampling.Buckets.toLong))
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getCanonicalName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes two array arguments")
        functions.CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[functions.WinnowFingerprint].getCanonicalName, "winnow_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fp(tokens, k, w) takes three arguments")
        functions.WinnowFingerprint(args(0),
          intArg(args(1), "k"), intArg(args(2), "w"))
      }),
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[functions.BpeEncode].getCanonicalName, "bpe_encode"),
      (args: Seq[Expression]) => {
        // the engine's frozen merge table (ops.Tokenize.FixedMerges) —
        // the SQL surface mirrors the catalog queries; a custom merge
        // table goes through the Scala API (Tokenize.encodeExpr)
        require(args.length == 1, "bpe_encode(text) takes one string argument")
        functions.BpeEncode(args.head, ops.Tokenize.FixedMerges)
      }))

  // ---- table-valued functions over lake tables ------------------------
  // (Delta's table_changes() / DESCRIBE HISTORY as TVFs):
  //   SELECT * FROM graft_changes('/wh/db/t', 0, 5)  -- CDC rows
  //   SELECT * FROM graft_history('/wh/db/t')        -- commit timeline
  // The root is a table path (the catalog's <warehouse>/<ns>/<table>);
  // graft_changes resolves key/precombine config from the table's
  // persisted descriptor. Arguments must be literals (they configure
  // the scan, like parquet's path argument).

  private def lakeAt(root: String): graft.lake.LakeTable = {
    val spark = SparkSession.active
    val desc = graft.lake.TableDescriptor
      .load(root, spark.sparkContext.hadoopConfiguration)
      .getOrElse(throw new IllegalArgumentException(
        s"no graft table descriptor at $root (create the table through " +
          "the graft catalog, or TableDescriptor.save one)"))
    graft.lake.LakeTable(spark, desc.config(root))
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case other if other.foldable => other.eval() match {
      case n: java.lang.Number => n.longValue()
      case _ => throw new IllegalArgumentException(s"$what must be a literal int")
    }
    case _ => throw new IllegalArgumentException(s"$what must be a literal int")
  }

  val injectedTableFns: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft.lake.LakeTable", "graft_changes"),
      (args: Seq[Expression]) => {
        // optional 4th argument (Delta table_changes' CDF contract):
        // true → updates split into update_preimage/update_postimage
        require(args.length == 3 || args.length == 4,
          "graft_changes(root, from_commit, to_commit[, pre_images]) " +
            "takes three or four arguments")
        val pre = args.length == 4 && (args(3) match {
          case b if b.foldable => b.eval() match {
            case x: java.lang.Boolean => x.booleanValue()
            case _ => throw new IllegalArgumentException(
              "pre_images must be a literal boolean")
          }
          case _ => throw new IllegalArgumentException(
            "pre_images must be a literal boolean")
        })
        lakeAt(strArg(args(0), "root"))
          .changesBetween(longArg(args(1), "from_commit"),
            longArg(args(2), "to_commit"), preImages = pre)
          .queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_history"),
      new ExpressionInfo("graft.lake.LakeTable", "graft_history"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_history(root) takes one argument")
        lakeAt(strArg(args(0), "root")).history().queryExecution.analyzed
      }),
    (FunctionIdentifier("graft_files"),
      new ExpressionInfo("graft.lake.LakeTable", "graft_files"),
      (args: Seq[Expression]) => {
        // live-file inventory (the Iceberg `.files` metadata-table
        // role): one row per live data file with its partition tuple,
        // kind (base/delta), and size — commit-log metadata only, no
        // data file is opened
        require(args.length == 1, "graft_files(root) takes one argument")
        val t = lakeAt(strArg(args(0), "root"))
        val spark = SparkSession.active
        val rows = t.log.liveFiles().map(f =>
          (f.path, f.partition, Option(f.kind).getOrElse("base"), f.bytes,
            f.rows, f.bloom, Option(f.kmin), Option(f.kmax)))
        spark.createDataFrame(rows)
          .toDF("path", "partition", "kind", "bytes",
            "n_rows", "has_bloom", "kmin", "kmax")
          .queryExecution.analyzed
      }))

  /** imperative registration into an already-built session */
  def register(spark: SparkSession): Unit = {
    injected.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    injectedTableFns.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
  }
}
