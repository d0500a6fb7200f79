package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Nested-schema-pruned reads through the V1 fallback (r16 regression):
  * Spark prunes `SELECT s.f` to a read schema of `s: struct<f>`, and
  * struct fields are consumed POSITIONALLY against the declared shape —
  * a scan that declares the pruned schema but returns full structs
  * silently serves the WRONG FIELD (`s.f` reading `s.a`'s bytes). The
  * V1 path must restructure each row to exactly the declared shape.
  * The V1 fallback engages whenever file schemas are non-uniform, which
  * is precisely the state every nested schema evolution leaves behind —
  * so this is the default read path for evolved structs.
  */
class NestedPruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft_nprune").toString
    spark.conf.set("spark.sql.catalog.npr", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.npr.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS npr.db")
    dir
  }

  test("pruned nested field reads ITS OWN values on an evolved struct") {
    wh
    spark.sql("""CREATE TABLE npr.db.t (pk BIGINT, ts INT,
        s STRUCT<a: INT, b: STRING>) USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("INSERT INTO npr.db.t VALUES (1, 0, named_struct('a', 11, 'b', 'x'))")
    // evolve the struct: files are now schema-non-uniform → V1 fallback
    spark.sql("ALTER TABLE npr.db.t ADD COLUMN s.f INT")
    spark.sql("""INSERT INTO npr.db.t VALUES
      (2, 0, named_struct('a', 22, 'b', 'y', 'f', 99))""")

    // the pruned single-field read: f must be f (null for the pre-field
    // row), NEVER a's bytes under the pruned declaration
    val f = spark.sql("SELECT pk, s.f FROM npr.db.t ORDER BY pk").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1)))
    assert(f.toSeq == Seq((1L, null), (2L, 99)),
      s"pruned s.f must serve f's values, got ${f.toSeq}")
    // a two-field pruned subset keeps name→value alignment
    val bf = spark.sql("SELECT pk, s.b, s.f FROM npr.db.t ORDER BY pk").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getInt(2)))
    assert(bf.toSeq == Seq((1L, "x", null), (2L, "y", 99)))
    // the full struct still reads whole
    val s1 = spark.sql("SELECT s FROM npr.db.t WHERE pk = 2").collect()(0)
      .getStruct(0)
    assert(s1.getInt(0) == 22 && s1.getString(1) == "y" && s1.getInt(2) == 99)
  }

  test("pruning inside arrays of structs keeps alignment (forced V1 path)") {
    wh
    spark.sql("""CREATE TABLE npr.db.arr (pk BIGINT, ts INT,
        xs ARRAY<STRUCT<a: INT, b: INT>>) USING graft
      TBLPROPERTIES (keyCols='pk', precombineCol='ts')""")
    spark.sql("""INSERT INTO npr.db.arr VALUES
      (1, 0, array(named_struct('a', 1, 'b', 2), named_struct('a', 3, 'b', 4))),
      (2, 0, array(named_struct('a', 5, 'b', 6)))""")
    // the kill switch routes uniform-schema tables through V1 too — the
    // same row-shape contract must hold there
    spark.conf.set("spark.graft.nativeScan.enabled", "false")
    try {
      val got = spark.sql(
        "SELECT pk, transform(xs, x -> x.b) AS bs FROM npr.db.arr ORDER BY pk")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
      assert(got.toSeq == Seq((1L, List(2, 4)), (2L, List(6))),
        s"array-of-struct pruned field must be b's values, got ${got.toSeq}")
    } finally spark.conf.unset("spark.graft.nativeScan.enabled")
  }
}
