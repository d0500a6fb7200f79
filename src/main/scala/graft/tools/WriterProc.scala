package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.lake.{CommitConflict, LakeTable, LakeTableConfig}

/** Cross-process OCC harness (spawned by ConcurrencySpec, one JVM per
  * writer): upserts a single row into a shared table root, BARRIERED so
  * both processes resolve the same head before either publishes — the
  * exact interleaving the optimistic check guards, now across real
  * process boundaries where the only shared state is the filesystem.
  *
  * The one-winner guarantee rests on nothing in-memory: commit publish
  * is an atomic create-or-fail of the commit JSON
  * ([[graft.lake.CommitLog]]), which the filesystem serializes across
  * processes exactly as it does across threads — POSIX O_EXCL locally;
  * the documented deployment assumption is any store with atomic
  * create-if-absent (HDFS create, S3 if-none-match conditional put).
  *
  * Protocol: after head resolution this process drops `ready-<id>` in
  * the sync dir and spins until `go` appears (the spec creates `go`
  * once every writer is ready), then publishes. Exit codes:
  * 0 = committed (possibly after a disjoint-partition rebase),
  * 2 = clean [[CommitConflict]] abort, 3 = barrier timeout/other.
  */
object WriterProc {
  def main(args: Array[String]): Unit = {
    val Array(root, vendor, pk, tag, syncDir, procId) = args.take(6)
    // optional 7th arg: same-partition OCC auto-retry attempts
    val occRetries = if (args.length > 6) args(6).toInt else 0
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-writer-$procId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = LakeTable(spark, LakeTableConfig(root, keyCols = Seq("pk"),
      precombineCol = "ts", partitionCols = Seq("vendorid"),
      occRetries = occRetries))
    // barrier INSIDE the resolve→publish window, armed once: the rebase
    // attempt after a lost race must run unimpeded
    t.onHeadResolved = () => {
      t.onHeadResolved = () => ()
      Files.write(Paths.get(syncDir, s"ready-$procId"), Array.empty[Byte])
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!Files.exists(Paths.get(syncDir, "go"))) {
        if (System.nanoTime() > deadline) sys.exit(3)
        Thread.sleep(25)
      }
    }
    val rows = Seq((pk.toLong, vendor.toInt, tag, 1)).toDF("pk", "vendorid", "payload", "ts")
    val code =
      try { t.upsert(rows); 0 }
      catch { case _: CommitConflict => 2 }
    spark.stop()
    sys.exit(code)
  }
}
