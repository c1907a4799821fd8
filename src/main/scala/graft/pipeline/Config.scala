package graft.pipeline

import java.nio.file.{Files, Path}

/** Layered engine configuration with the reference's precedence
  * contract (/root/reference/src/config.py:14-57): values from a YAML
  * file override builder-supplied defaults, and `GRAFT_*` environment
  * variables override the file (the reference's prefix is `FSA_`).
  *
  * Keys are flattened dotted paths (`audit.tools.yara_x.rules_dir`).
  * The env mapping follows the reference rule exactly: with the prefix
  * stripped and lowercased, `GRAFT_AGENT_LOG_LEVEL` → section `agent`,
  * key `log_level` (first underscore splits the section, the rest keeps
  * its underscores); a prefixed var with no underscore is a top-level
  * key. Env values are strings, like `os.environ` — typed access goes
  * through the getters.
  *
  * The YAML parser is a deliberate dep-free SUBSET sized to the
  * reference's own `config.yaml`: nested maps by indentation, `- item`
  * scalar lists (stored comma-joined; see [[GraftConfig.getList]]),
  * single/double-quoted scalars, `#` comments, blank lines. List items
  * may sit indented under their key or at the key's own indent (the
  * common zero-indent style). Anchors, flow style, multi-line scalars,
  * tabs and block sequences of mappings (`- name: a`) are out of
  * contract and fail loudly rather than mis-parse.
  */
final case class GraftConfig(values: Map[String, String]) {

  def get(key: String): Option[String] = values.get(key)

  def getOrElse(key: String, default: => String): String = values.getOrElse(key, default)

  /** Typed getters: a present-but-malformed value is a configuration
    * error, not a silent fallback to the default.
    */
  def getInt(key: String, default: => Int): Int =
    values.get(key).map(v => v.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"config $key: not an int: '$v'"))).getOrElse(default)

  def getDouble(key: String, default: => Double): Double =
    values.get(key).map(v => v.toDoubleOption.getOrElse(
      throw new IllegalArgumentException(s"config $key: not a double: '$v'"))).getOrElse(default)

  def getBoolean(key: String, default: => Boolean): Boolean =
    values.get(key).map(_.trim.toLowerCase match {
      case "true" | "yes" | "on" => true
      case "false" | "no" | "off" => false
      case v => throw new IllegalArgumentException(s"config $key: not a boolean: '$v'")
    }).getOrElse(default)

  /** List values (`- a` / `- b` in YAML) come back as Seq; a scalar
    * behaves as a one-element list.
    */
  def getList(key: String): Seq[String] =
    values.get(key).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)

  /** All keys under `section.`, with the prefix stripped —
    * `section("agent")("log_level")`.
    */
  def section(name: String): Map[String, String] =
    values.collect { case (k, v) if k.startsWith(name + ".") => k.drop(name.length + 1) -> v }
}

object GraftConfig {

  /** Load with full precedence: `defaults` < YAML at `path` < `env`
    * vars starting with `prefix`. A missing file throws (reference
    * parity: `FileNotFoundError`, config.py:16-18) — use
    * [[loadOrDefaults]] when the file is optional.
    */
  def load(
      path: Path,
      defaults: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      prefix: String = "GRAFT_"): GraftConfig = {
    if (!Files.exists(path))
      throw new java.io.FileNotFoundException(s"Configuration file not found: $path")
    GraftConfig(defaults ++ parseYaml(Files.readString(path)) ++ envOverlay(env, prefix))
  }

  /** As [[load]] but an absent file contributes nothing (env still
    * overrides the defaults).
    */
  def loadOrDefaults(
      path: Path,
      defaults: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      prefix: String = "GRAFT_"): GraftConfig = {
    val fromFile = if (Files.exists(path)) parseYaml(Files.readString(path)) else Map.empty
    GraftConfig(defaults ++ fromFile ++ envOverlay(env, prefix))
  }

  /** Reference env rule (config.py:36-57), prefix swapped: strip the
    * prefix, lowercase; one underscore-free token is a top-level key,
    * otherwise the FIRST token is the section and the remainder (with
    * its underscores intact) the key inside it.
    */
  private[graft] def envOverlay(
      env: Map[String, String], prefix: String): Map[String, String] =
    env.collect { case (k, v) if k.startsWith(prefix) && k.length > prefix.length =>
      val key = k.drop(prefix.length).toLowerCase
      val path = key.indexOf('_') match {
        case -1 => key
        case i => key.substring(0, i) + "." + key.substring(i + 1)
      }
      path -> v
    }

  /** Indentation-driven subset parser → flattened dotted-path map. */
  private[graft] def parseYaml(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val lists = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    // (indent, name) frames of the currently open mapping path
    var stack = List.empty[(Int, String)]
    // what the previous non-blank line contributed: the path of a frame
    // it OPENED, or the (owner path, indent) of a list ITEM it appended —
    // a block sequence is only well-formed when each item directly
    // follows its key or a sibling item AT THE SAME INDENT, so anything
    // else attaching to an ancestor frame (`a:\n  b: 1\n- x`) or
    // drifting indent mid-list (`- x\n    - y`, a nested sequence in
    // real YAML) is a mis-parse and fails loudly
    var lastOpened = Option.empty[String]
    var lastItem = Option.empty[(String, Int)]
    for ((raw, ln) <- text.linesIterator.zipWithIndex) {
      require(!raw.contains('\t'), s"yaml line ${ln + 1}: tabs are out of contract")
      val noComment = stripComment(raw)
      val line = noComment.trim
      if (line.nonEmpty) {
        val indent = noComment.indexWhere(_ != ' ')
        val isItem = line.startsWith("- ") || line == "-"
        // a list item may sit at the SAME indent as its key (the common
        // zero-indent style `key:\n- a`); a mapping key always closes
        // frames at its own indent or deeper
        stack = if (isItem) stack.filter(_._1 <= indent) else stack.filter(_._1 < indent)
        val pathOf = (k: String) => (stack.map(_._2).reverse :+ k).mkString(".")
        if (isItem) {
          stack.headOption.getOrElse(
            throw new IllegalArgumentException(s"yaml line ${ln + 1}: list item with no key"))
          val ownerPath = (stack.map(_._2).reverse).mkString(".")
          require(lastOpened.contains(ownerPath) || lastItem.contains((ownerPath, indent)),
            s"yaml line ${ln + 1}: list item does not directly follow its key " +
              s"at a consistent indent (would attach to '$ownerPath')")
          lastOpened = None
          lastItem = Some((ownerPath, indent))
          val item = line.drop(1).trim
          // block sequences of MAPPINGS (`- name: a`) are out of
          // contract: storing the scalar `name: a` and re-attaching the
          // item's continuation lines to the parent would mis-parse, so
          // fail loudly instead (quoted scalars may contain ': ')
          val quoted = item.length >= 2 &&
            ((item.head == '"' && item.last == '"') || (item.head == '\'' && item.last == '\''))
          require(quoted || !(item.contains(": ") || item.endsWith(":")),
            s"yaml line ${ln + 1}: mappings inside lists are out of contract")
          lists(ownerPath) = lists.getOrElse(ownerPath, Vector.empty) :+ unquote(item)
        } else {
          val i = line.indexOf(':')
          require(i > 0, s"yaml line ${ln + 1}: expected 'key: value', got '$line'")
          val k = line.substring(0, i).trim
          val v = line.substring(i + 1).trim
          require(!k.contains(' '), s"yaml line ${ln + 1}: flow/complex keys are out of contract")
          if (v.isEmpty) { // opens a nested map or list
            stack = (indent, k) :: stack
            lastOpened = Some(stack.map(_._2).reverse.mkString("."))
            lastItem = None
          } else {
            out(pathOf(k)) = unquote(v)
            lastOpened = None
            lastItem = None
          }
        }
      }
    }
    (out ++ lists.map { case (k, items) => k -> items.mkString(",") }).toMap
  }

  /** Drop a trailing ` #...` comment, but never from inside quotes. */
  private def stripComment(line: String): String = {
    var inS = false
    var inD = false
    var i = 0
    while (i < line.length) {
      line(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD && (i == 0 || line(i - 1) == ' ') =>
          return line.substring(0, i)
        case _ =>
      }
      i += 1
    }
    line
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') {
      // double-quoted: backslash escapes the next char (covers the \\
      // and \" the reference config uses; exotic \n-style escapes are
      // out of contract and pass through literally minus the backslash)
      val body = v.substring(1, v.length - 1)
      val sb = new StringBuilder(body.length)
      var i = 0
      while (i < body.length) {
        if (body(i) == '\\' && i + 1 < body.length) { sb.append(body(i + 1)); i += 2 }
        else { sb.append(body(i)); i += 1 }
      }
      sb.toString
    } else if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1).replace("''", "'")
    else v
}
