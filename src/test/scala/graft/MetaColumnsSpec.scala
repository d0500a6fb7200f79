package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{LakeTable, LakeTableConfig}

/** Full Hudi meta-column read parity (`metaColumns = true`;
  * MockCuratedGlueJob.py:23-24 observes the 5-column `_hoodie_*`
  * surface): `_commit_seqno` is materialized at write time and carries
  * its row's ingesting commit id through rewrites; `_file_name` is the
  * scanned parquet basename, captured at the scan and never persisted.
  */
class MetaColumnsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("metacols").resolve("tbl").toString

  private def df(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "payload", "ts")
  }

  private def mk(storage: String, meta: Boolean = true): LakeTable =
    LakeTable(spark, LakeTableConfig(freshRoot(), keyCols = Seq("pk"),
      precombineCol = "ts", storageType = storage, metaColumns = meta))

  test("snapshot read surfaces the five-column Hudi meta surface") {
    val t = mk("cow")
    t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))         // c0
    t.upsert(df((2L, "b2", 1)))                          // c1
    val out = t.read()
    for (c <- Seq("_commit_id", "_record_key", "_commit_seqno", "_file_name"))
      assert(out.columns.contains(c), s"missing meta column $c")
    val rows = out.select("pk", "_commit_id", "_commit_seqno", "_file_name")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    // provenance: pk=1 untouched (c0), pk=2 rewritten by c1
    assert(rows(1L)._1 == 0L && rows(2L)._1 == 1L)
    // seqno prefix is the ingesting commit id, suffix a parseable row id
    rows.values.foreach { case (cid, seqno, fname) =>
      val Array(p, rid) = seqno.split("_", 2)
      assert(p.toLong == cid, s"seqno $seqno does not carry commit $cid")
      assert(rid.toLong >= 0L)
      assert(fname.matches("part-.*\\.parquet"), s"odd file name $fname")
    }
    // _file_name matches a file that physically exists in the table root
    val onDisk = {
      val walk = Files.walk(java.nio.file.Paths.get(t.config.root))
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
      finally walk.close()
    }
    rows.values.foreach { case (_, _, fname) =>
      assert(onDisk.contains(fname), s"$fname not on disk")
    }
  }

  test("seqno survives CoW rewrites; file name tracks the current file") {
    val t = mk("cow")
    t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))
    val before = t.read().select("pk", "_commit_seqno", "_file_name")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    t.upsert(df((2L, "b2", 1))) // unpartitioned CoW: rewrites pk=1's file too
    val after = t.read().select("pk", "_commit_seqno", "_file_name")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(after(1L)._1 == before(1L)._1,
      "pass-through row must keep its original _commit_seqno across rewrite")
    assert(after(2L)._1 != before(2L)._1,
      "updated row must get a fresh _commit_seqno")
  }

  test("MoR: merged snapshot tags _file_name; compaction keeps seqno") {
    val t = mk("mor")
    t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))
    t.upsert(df((2L, "b2", 1))) // delta file
    val merged = t.read().select("pk", "_commit_id", "_commit_seqno", "_file_name")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(merged(2L)._1 == 1L && merged(2L)._2.startsWith("1_"))
    assert(merged.values.forall(_._3.nonEmpty), "every merged row is tagged")
    t.compact()
    val compacted = t.read().select("pk", "_commit_seqno")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(compacted(1L) == merged(1L)._2 && compacted(2L) == merged(2L)._2,
      "compaction rewrote rows but must preserve their ingest seqno")
  }

  test("time travel reads carry the meta surface of that snapshot") {
    val t = mk("cow")
    val c0 = t.bulkInsert(df((1L, "a", 0), (2L, "b", 0)))
    t.upsert(df((2L, "b2", 1)))
    val tt = t.readAsOf(c0)
    assert(tt.columns.contains("_file_name"))
    assert(tt.select("_commit_id").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(c0), "as-of read must show only c0 provenance")
  }

  test("unflagged tables are unchanged: no seqno, no file name") {
    val t = mk("cow", meta = false)
    t.bulkInsert(df((1L, "a", 0)))
    val cols = t.read().columns.toSet
    assert(cols.contains("_commit_id") && cols.contains("_record_key"))
    assert(!cols.contains("_commit_seqno") && !cols.contains("_file_name"))
  }
}
