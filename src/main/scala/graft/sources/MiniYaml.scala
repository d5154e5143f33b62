package graft.sources

/** Minimal indentation-based YAML subset parser, matching the reference's
  * semantics (reference: src/parser/yaml.ts:11-180): nested objects, block
  * arrays, inline `[a, b]` arrays (single- and multi-line), booleans, numbers,
  * null, and `#` comments. No anchors / multi-doc / quoting subtleties — the
  * same subset the reference supports.
  *
  * Returns a JSON-ish AST: `Map[String, Any] | List[Any] | String | Double |
  * Boolean | null`. Runs per-file inside executors (see [[StaticSources]]);
  * the driver never parses content.
  */
object MiniYaml {

  def parse(rawContent: String): Any = {
    val lines = rawContent.replace("\r\n", "\n").split("\n", -1)
    var idx = 0

    def isBlank(l: String) = l.trim.isEmpty || l.trim.startsWith("#")
    def indentOf(l: String) = l.takeWhile(_ == ' ').length

    def parseValue(v: String): Any = v match {
      case "true"  => true
      case "false" => false
      case "null"  => null
      case ""      => null
      case s if s.matches("^-?\\d+(\\.\\d+)?$") =>
        // numbers wider than Long/Double fall back to string rather than
        // throwing inside an executor and failing the whole ingest
        if (s.contains('.')) scala.util.Try(s.toDouble).getOrElse(s)
        else scala.util.Try(s.toLong).getOrElse(s)
      // Inline-array elements stay STRINGS (no scalar parsing) while block
      // arrays route through parseValue — asymmetric, but byte-for-byte the
      // reference's behavior (yaml.ts parseValue slices/splits inline arrays
      // without recursing; parseBlock pushes parseValue(item) for block
      // items). The same goes for commas inside quoted elements: neither
      // parser supports them. Reference compatibility is the spec here.
      case s if s.startsWith("[") && s.endsWith("]") =>
        s.substring(1, s.length - 1).split(",")
          .map(_.replaceAll("^[\\s'\"]+|[\\s'\",]+$", ""))
          .filter(_.nonEmpty).toList
      case s => s
    }

    def parseBlock(indent: Int): Any = {
      val result = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var arr: scala.collection.mutable.ListBuffer[Any] = null

      while (idx < lines.length) {
        val line = lines(idx)
        if (isBlank(line)) { idx += 1 }
        else {
          val cur = indentOf(line)
          if (cur < indent) return finish(result, arr, indent)
          val trimmed = line.trim
          if (trimmed.startsWith("- ") || trimmed == "-") {
            if (arr == null) arr = scala.collection.mutable.ListBuffer.empty[Any]
            val itemLine = trimmed.stripPrefix("-").stripPrefix(" ")
            if (itemLine.contains(":")) {
              val Array(k, rest @ _*) = itemLine.split(":", 2)
              val obj = scala.collection.mutable.LinkedHashMap.empty[String, Any]
              obj(k.trim) = parseValue(rest.mkString(":").trim)
              idx += 1
              parseBlock(cur + 2) match {
                case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].foreach { case (kk, vv) => obj(kk) = vv }
                case _            =>
              }
              arr += obj.toMap
            } else { arr += parseValue(itemLine.trim); idx += 1 }
          } else if (line.contains(":")) {
            val Array(k, rest @ _*) = line.split(":", 2)
            var value = rest.mkString(":").trim
            idx += 1
            // multi-line inline array
            if (value.startsWith("[") && !value.endsWith("]")) {
              val sb = new StringBuilder(value)
              var done = false
              while (idx < lines.length && !done) {
                val l = lines(idx).trim
                sb.append(" ").append(l)
                idx += 1
                if (l.endsWith("]")) done = true
              }
              value = sb.toString.replaceAll("\\s+", " ")
            }
            val next = if (idx < lines.length) Some(lines(idx)) else None
            val nextIndent = next.map(indentOf).getOrElse(-1)
            val nextIsChild = next.exists(n => !isBlank(n) && nextIndent > cur)
            if (value.isEmpty && nextIsChild && next.get.trim.startsWith("- ")) {
              result(k.trim) = parseArrayBlock(cur + 2)
            } else if (value.isEmpty && nextIsChild && next.get.trim.startsWith("[")) {
              // inline array on its own indented line(s) under a bare key
              // (reference: src/parser/yaml.ts:70-85)
              val sb = new StringBuilder
              var done2 = false
              while (idx < lines.length && !done2) {
                val l = lines(idx).trim
                if (sb.nonEmpty) sb.append(" ")
                sb.append(l)
                idx += 1
                if (l.endsWith("]")) done2 = true
              }
              result(k.trim) = parseValue(sb.toString.replaceAll("\\s+", " "))
            } else if (value.isEmpty && nextIsChild) {
              parseBlock(cur + 2) match {
                case m: Map[_, _] if m.nonEmpty => result(k.trim) = m
                case l: List[_]                 => result(k.trim) = l
                case _                          => result(k.trim) = parseValue(value)
              }
            } else result(k.trim) = parseValue(value)
          } else idx += 1
        }
      }
      finish(result, arr, indent)
    }

    def finish(m: scala.collection.mutable.LinkedHashMap[String, Any],
               arr: scala.collection.mutable.ListBuffer[Any], indent: Int): Any =
      if (arr != null && arr.nonEmpty) arr.toList
      else if (arr != null && indent == 0) List.empty[Any]
      else m.toMap

    def parseArrayBlock(indent: Int): List[Any] = {
      val arr = scala.collection.mutable.ListBuffer.empty[Any]
      var done = false
      while (idx < lines.length && !done) {
        val line = lines(idx)
        if (isBlank(line)) idx += 1
        else {
          val cur = indentOf(line)
          if (cur < indent) done = true
          else if (line.trim.startsWith("- ") || line.trim == "-") {
            val itemLine = line.trim.stripPrefix("-").stripPrefix(" ")
            if (itemLine.contains(":")) {
              val Array(k, rest @ _*) = itemLine.split(":", 2)
              val obj = scala.collection.mutable.LinkedHashMap.empty[String, Any]
              obj(k.trim) = parseValue(rest.mkString(":").trim)
              idx += 1
              parseBlock(cur + 2) match {
                case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].foreach { case (kk, vv) => obj(kk) = vv }
                case _            =>
              }
              arr += obj.toMap
            } else { arr += parseValue(itemLine.trim); idx += 1 }
          } else done = true
        }
      }
      arr.toList
    }

    // skip leading blanks/comments
    while (idx < lines.length && isBlank(lines(idx))) idx += 1
    if (idx < lines.length && lines(idx).trim.startsWith("- ")) parseArrayBlock(0)
    else parseBlock(0)
  }

  /** Render the AST as a canonical JSON string (used to feed Spark's
    * distributed JSON schema inference in [[StaticSources]]).
    */
  def toJson(v: Any): String = v match {
    case null            => "null"
    case b: Boolean      => b.toString
    case l: Long         => l.toString
    case d: Double       =>
      // integral render only when the value FITS in a Long (toLong saturates
      // at Long.MaxValue for bigger magnitudes, silently corrupting the value)
      if (d == d.floor && !d.isInfinite && !d.isNaN && math.abs(d) < 9.007199254740992e15)
        d.toLong.toString
      else if (d.isNaN || d.isInfinite) "null"
      else d.toString
    case i: Int          => i.toString
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, vv) => s"${quote(k)}:${toJson(vv)}" }
        .mkString("{", ",", "}")
    case l: Seq[_]       => l.map(toJson).mkString("[", ",", "]")
    case s: String       => quote(s)
    case other           => quote(String.valueOf(other))
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
