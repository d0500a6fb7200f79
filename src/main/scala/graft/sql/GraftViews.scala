package graft.sql

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Persisted SQL view definition — the catalog's counterpart of a Hive
  * metastore view entry (the reference's Glue catalog stores views the
  * same way: a SQL text plus the defining context, no data). Spark
  * 4.1's analyzer has no native v2-view execution (ResolveSessionCatalog
  * hard-throws MISSING_CATALOG_ABILITY for CREATE VIEW on any
  * non-session catalog — verified against the shipped bytecode), so
  * graft views are carried by the engine's own parser hook + resolution
  * rule ([[GraftSqlParser]], [[GraftViewRule]]) — the same integration
  * shape Iceberg ships for Spark view support.
  *
  * `currentCatalog`/`currentNamespace` freeze the DEFINER's name
  * resolution context: a view body referencing a bare `t` must keep
  * meaning `<definerCat>.<definerNs>.t` no matter who reads it later
  * (ANSI view semantics; Spark's own persisted views store the same).
  */
final case class ViewDef(
    /** original SELECT text — the authoritative definition */
    sql: String,
    /** user-specified column list (`CREATE VIEW v (a, b) AS ...`);
      * empty = the query's own output names */
    columnAliases: Seq[String] = Seq.empty,
    comment: String = "",
    properties: Map[String, String] = Map.empty,
    currentCatalog: String = "",
    currentNamespace: Seq[String] = Seq.empty,
    /** analyzed output schema at definition time (informational:
      * SHOW/describe surfaces; resolution always re-analyzes the text) */
    schemaJson: String = "",
    createdMs: Long = 0L)

/** View persistence: `<warehouse>/<ns...>/.views/<name>.json`. The
  * dot-prefixed directory is invisible to table listing (the catalog
  * filters hidden dirs) and rejected as a table name by the identifier
  * guard, so views and tables can never collide on disk paths; name
  * collisions are still checked logically at CREATE time.
  */
object ViewStore {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_UNKNOWN_PROPERTIES, false)

  def dir(warehouse: String, ns: Seq[String]): Path =
    new Path(ns.foldLeft(new Path(warehouse))((p, s) => new Path(p, s)), ".views")

  def file(warehouse: String, ns: Seq[String], name: String): Path =
    new Path(dir(warehouse, ns), s"$name.json")

  def exists(warehouse: String, ns: Seq[String], name: String,
      hconf: Configuration): Boolean = {
    val p = file(warehouse, ns, name)
    fs(p, hconf).exists(p)
  }

  def save(warehouse: String, ns: Seq[String], name: String, v: ViewDef,
      hconf: Configuration): Unit = {
    val p = file(warehouse, ns, name)
    val f = fs(p, hconf)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(mapper.writeValueAsBytes(v)) finally out.close()
  }

  def load(warehouse: String, ns: Seq[String], name: String,
      hconf: Configuration): Option[ViewDef] = {
    val p = file(warehouse, ns, name)
    val f = fs(p, hconf)
    if (!f.exists(p)) None
    else {
      val in: java.io.InputStream = f.open(p)
      try Some(mapper.readValue(in, classOf[ViewDef]))
      finally in.close()
    }
  }

  def drop(warehouse: String, ns: Seq[String], name: String,
      hconf: Configuration): Boolean = {
    val p = file(warehouse, ns, name)
    fs(p, hconf).delete(p, false)
  }

  def list(warehouse: String, ns: Seq[String],
      hconf: Configuration): Seq[String] = {
    val d = dir(warehouse, ns)
    val f = fs(d, hconf)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  private def fs(p: Path, hconf: Configuration): FileSystem =
    p.getFileSystem(hconf)
}
