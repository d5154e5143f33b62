package graft.sources

/** Minimal strict JSON parser to the same AST as [[MiniYaml]]
  * (Map/List/String/Long/Double/Boolean/null) — the reference delegates to
  * `JSON.parse` (reference: src/parser/json.ts:10); the JVM has no built-in,
  * and the build is dependency-free by design.
  */
object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"Trailing content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    private def ch: Char = { require(!eof, "Unexpected end of JSON"); s(pos) }
    private def expect(c: Char): Unit = { ws(); require(ch == c, s"Expected '$c' at $pos, got '$ch'"); pos += 1 }

    def value(): Any = {
      ws()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      require(s.startsWith(word, pos), s"Bad literal at $pos")
      pos += word.length; v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      if (ch == '}') { pos += 1; return m.toMap }
      var done = false
      while (!done) {
        ws(); val k = str(); expect(':'); m(k) = value(); ws()
        if (ch == ',') pos += 1 else { expect('}'); done = true }
      }
      m.toMap
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      val b = scala.collection.mutable.ListBuffer.empty[Any]
      if (ch == ']') { pos += 1; return b.toList }
      var done = false
      while (!done) {
        b += value(); ws()
        if (ch == ',') pos += 1 else { expect(']'); done = true }
      }
      b.toList
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          pos += 1
          ch match {
            case 'n' => sb += '\n'; pos += 1
            case 't' => sb += '\t'; pos += 1
            case 'r' => sb += '\r'; pos += 1
            case 'b' => sb += '\b'; pos += 1
            case 'f' => sb += '\f'; pos += 1
            case '/' => sb += '/'; pos += 1
            case '"' => sb += '"'; pos += 1
            case '\\' => sb += '\\'; pos += 1
            case 'u' =>
              require(pos + 5 <= s.length, s"Truncated \\u escape at $pos")
              val hex = s.substring(pos + 1, pos + 5)
              // strict ASCII hex digits only: parseInt(_, 16) would also
              // accept a sign ("\\u-abc" → -2748 → a garbage char), and
              // Character.digit(c, 16) would accept non-ASCII Unicode digits
              // (Arabic-Indic, fullwidth) — and a raw NumberFormatException
              // would escape the parser's
              // IllegalArgumentException-with-position contract
              def asciiHex(c: Char): Boolean =
                (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
              if (!hex.forall(asciiHex))
                throw new IllegalArgumentException(s"Bad \\u escape '\\u$hex' at $pos")
              sb += Integer.parseInt(hex, 16).toChar
              pos += 5
            case c => throw new IllegalArgumentException(s"Bad escape '\\$c' at $pos")
          }
        } else { sb += ch; pos += 1 }
      }
      pos += 1
      sb.toString
    }

    private def num(): Any = {
      val start = pos
      if (!eof && ch == '-') pos += 1
      while (!eof && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      val t = s.substring(start, pos)
      require(t.nonEmpty && t.exists(_.isDigit), s"Bad number at $start")
      // malformed runs ('1.2.3', '1e', '--1') stay inside the parser's error
      // contract instead of escaping as NumberFormatException
      def bad() = throw new IllegalArgumentException(s"Bad number '$t' at $start")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E'))
        scala.util.Try(t.toDouble).getOrElse(bad())
      // integers wider than Long degrade to Double, like JSON.parse (the
      // reference's parser) — never an executor-killing NumberFormatException
      else scala.util.Try[Any](t.toLong)
        .orElse(scala.util.Try[Any](t.toDouble)).getOrElse(bad())
    }
  }
}
