package graft.sql

/** Codec for the `checks` table property: `name1:expr1;name2:expr2`.
  *
  * The name/expression separator is the FIRST ':' of an entry (names
  * are identifiers and may not contain ':' or ';'; SQL expressions
  * contain '=' often and ':' rarely, so ':' inside the expression is
  * fine once the name is clean). Because a legal CHECK expression may
  * contain a literal ';' (e.g. `v != 'a;b'`), the renderer
  * backslash-escapes ';' and '\' in expressions and the parser honors
  * the escapes — without this, SHOW CREATE TABLE / ALTER round-trips
  * would split mid-expression and reject a representable constraint.
  *
  * ONE render and ONE parse so GraftTableV2.properties (SHOW CREATE
  * TABLE / SHOW TBLPROPERTIES) and GraftCatalog (CREATE / ALTER) can
  * never drift to different syntaxes.
  */
private[graft] object ChecksProp {

  def render(checks: Map[String, String]): String =
    checks.toSeq.sortBy(_._1).map { case (name, expr) =>
      require(!name.exists(c => c == ':' || c == ';' || c == '\\'),
        s"CHECK name '$name' may not contain ':', ';' or '\\'")
      name + ":" + expr.replace("\\", "\\\\").replace(";", "\\;")
    }.mkString(";")

  def parse(v: String): Map[String, String] = {
    // split on UNESCAPED ';' only; '\;' and '\\' decode to ';' and '\'
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < v.length) {
      v.charAt(i) match {
        case '\\' if i + 1 < v.length =>
          cur.append(v.charAt(i + 1)); i += 2
        case ';' => entries += cur.result(); cur.clear(); i += 1
        case c => cur.append(c); i += 1
      }
    }
    entries += cur.result()
    entries.toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      val sep = kv.indexOf(':')
      require(sep > 0, s"checks entries are 'name:expr', got '$kv'")
      kv.take(sep).trim -> kv.drop(sep + 1).trim
    }.toMap
  }
}
