package graft.functions

import org.apache.spark.sql.Column

/** Glob (fnmatch-style) pattern matching as pure Column expressions.
  *
  * Re-expresses the reference's include/exclude glob filters
  * (/root/reference/src/etl_template_base.py:156-173, fnmatch semantics:
  * `*` matches any run including separators, `?` one char) as SQL
  * `LIKE`/`RLIKE` so Catalyst can push them to the scan.
  */
object Glob {

  /** fnmatch glob → anchored Java regex. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** fnmatch glob → SQL LIKE pattern (only valid when the glob has no
    * `[seq]` classes; `%`/`_` in the input are escaped).
    */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case c => c.toString
    }

  /** Column predicate: does `path` match the glob? */
  def globMatch(path: Column, glob: String): Column =
    if (glob.exists(c => c == '[' || c == ']')) path.rlike(globToRegex(glob))
    else path.like(globToLike(glob))

  /** ANY-of-includes ∧ NONE-of-excludes conjunction, as one Column
    * (reference: include ANY / exclude NONE,
    * src/etl_template_base.py:156-173).
    */
  def globFilter(path: Column, includes: Seq[String], excludes: Seq[String]): Column = {
    import org.apache.spark.sql.functions.lit
    val inc =
      if (includes.isEmpty) lit(true)
      else includes.map(globMatch(path, _)).reduce(_ || _)
    val exc =
      if (excludes.isEmpty) lit(true)
      else excludes.map(g => !globMatch(path, g)).reduce(_ && _)
    inc && exc
  }
}
