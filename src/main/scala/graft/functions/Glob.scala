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

  /** fnmatch glob → anchored Java regex, including `[seq]` / `[!seq]`
    * character classes (fnmatch rules: `!` negates, a `]` first in the
    * class is literal, an unterminated `[` is a literal bracket).
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    val n = glob.length
    var i = 0
    while (i < n) {
      glob(i) match {
        case '*' => sb.append(".*"); i += 1
        case '?' => sb.append('.'); i += 1
        case '[' =>
          var j = i + 1
          if (j < n && glob(j) == '!') j += 1
          if (j < n && glob(j) == ']') j += 1 // leading ] is literal
          while (j < n && glob(j) != ']') j += 1
          if (j >= n) { sb.append("\\["); i += 1 } // unterminated → literal
          else {
            val inner = glob.substring(i + 1, j)
            val (neg, body) = if (inner.startsWith("!")) (true, inner.tail) else (false, inner)
            val esc = body.flatMap {
              case c @ ('\\' | '^' | ']' | '[' | '&') => "\\" + c
              case c => c.toString
            }
            sb.append('[')
            if (neg) sb.append('^')
            sb.append(esc).append(']')
            i = j + 1
          }
        case c if "\\.]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c); i += 1
        case c => sb.append(c); i += 1
      }
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
      // '\' is the LIKE escape character: a literal backslash (Windows
      // paths — the reference's primary glob domain) must be doubled or
      // the pattern is an invalid escape sequence
      case '\\' => "\\\\"
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
