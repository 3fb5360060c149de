package graft.serve

import scala.collection.immutable.ListMap

/** Minimal JSON codec for the serving layer (`backend/app.py` speaks
  * FastAPI JSON; the engine must not grow a dependency for it — the JDK
  * ships HTTP client+server but no JSON). Recursive-descent parser over
  * the RFC 8259 grammar plus a writer with full control-character
  * escaping. Object key order is preserved (ListMap) so envelopes
  * serialize in the reference's field order.
  *
  * Serving-path only: request bodies are request-sized (a probe string +
  * filters), responses are k<=10 rows — never a data-plane codec (the
  * engine's JSON data paths are Spark's own from_json/to_json, e3/q33).
  */
sealed trait JValue {
  def render: String = this match {
    case JNull => "null"
    case JBool(b) => if (b) "true" else "false"
    case JNum(raw) => raw
    case JStr(s) => Json.quote(s)
    case JArr(xs) => xs.map(_.render).mkString("[", ",", "]")
    case JObj(fs) =>
      fs.map { case (k, v) => Json.quote(k) + ":" + v.render }
        .mkString("{", ",", "}")
  }
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
/** Numbers keep their source text so integers round-trip without a
  * double detour (skip=9007199254740993 must not silently lose bits). */
final case class JNum(raw: String) extends JValue {
  def toDouble: Double = raw.toDouble
  def toIntExact: Int = {
    val d = raw.toDouble
    val i = d.toInt
    require(i.toDouble == d, s"expected an integer, got $raw")
    i
  }
}
final case class JStr(value: String) extends JValue
final case class JArr(values: Vector[JValue]) extends JValue
final case class JObj(fields: ListMap[String, JValue]) extends JValue {
  def get(key: String): Option[JValue] = fields.get(key) match {
    case Some(JNull) => None // absent and null are both "not provided"
    case other => other
  }
}

object JNum { def apply(n: Long): JNum = JNum(n.toString) }
object JObj {
  def of(fs: (String, JValue)*): JObj = JObj(ListMap(fs: _*))
}

/** Thrown on malformed input; the server maps it to HTTP 422 (the
  * FastAPI parse-failure analogue). */
final class JsonParseException(msg: String) extends RuntimeException(msg)

object Json {

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b += '"'
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\n' => b ++= "\\n"
      case '\r' => b ++= "\\r"
      case '\t' => b ++= "\\t"
      case '\b' => b ++= "\\b"
      case '\f' => b ++= "\\f"
      case c if c < ' ' => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    b += '"'
    b.toString
  }

  def parse(text: String): JValue = {
    val p = new Parser(text)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content after JSON value")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new JsonParseException(s"$msg at offset $i")
    def skipWs(): Unit =
      while (i < s.length && (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' || s(i) == '\r')) i += 1
    private def expect(c: Char): Unit = {
      if (atEnd || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def lit(word: String, v: JValue): JValue = {
      if (!s.startsWith(word, i)) fail(s"expected $word")
      i += word.length; v
    }

    def value(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def obj(): JObj = {
      expect('{'); skipWs()
      if (!atEnd && s(i) == '}') { i += 1; return JObj(ListMap.empty) }
      var fs = ListMap.empty[String, JValue]
      var more = true
      while (more) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        fs = fs.updated(k, value())
        skipWs()
        if (!atEnd && s(i) == ',') i += 1
        else { expect('}'); more = false }
      }
      JObj(fs)
    }

    private def arr(): JArr = {
      expect('['); skipWs()
      if (!atEnd && s(i) == ']') { i += 1; return JArr(Vector.empty) }
      val b = Vector.newBuilder[JValue]
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!atEnd && s(i) == ',') i += 1
        else { expect(']'); more = false }
      }
      JArr(b.result())
    }

    private def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        s(i) match {
          case '"' => i += 1; return b.toString
          case '\\' =>
            i += 1
            if (atEnd) fail("unterminated escape")
            s(i) match {
              case '"' => b += '"'; i += 1
              case '\\' => b += '\\'; i += 1
              case '/' => b += '/'; i += 1
              case 'n' => b += '\n'; i += 1
              case 't' => b += '\t'; i += 1
              case 'r' => b += '\r'; i += 1
              case 'b' => b += '\b'; i += 1
              case 'f' => b += '\f'; i += 1
              case 'u' =>
                if (i + 5 > s.length) fail("truncated \\u escape")
                val hex = s.substring(i + 1, i + 5)
                val cp = try Integer.parseInt(hex, 16)
                         catch { case _: NumberFormatException => fail(s"bad \\u escape $hex") }
                b += cp.toChar; i += 5
              case c => fail(s"bad escape '\\$c'")
            }
          case c if c < ' ' => fail("raw control character in string")
          case c => b += c; i += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def num(): JNum = {
      val start = i
      if (!atEnd && s(i) == '-') i += 1
      while (!atEnd && s(i) >= '0' && s(i) <= '9') i += 1
      if (!atEnd && s(i) == '.') {
        i += 1
        while (!atEnd && s(i) >= '0' && s(i) <= '9') i += 1
      }
      if (!atEnd && (s(i) == 'e' || s(i) == 'E')) {
        i += 1
        if (!atEnd && (s(i) == '+' || s(i) == '-')) i += 1
        while (!atEnd && s(i) >= '0' && s(i) <= '9') i += 1
      }
      val raw = s.substring(start, i)
      // reject the empty/lone-minus/lone-dot degenerates the scanner allows
      try { raw.toDouble } catch { case _: NumberFormatException => fail(s"bad number '$raw'") }
      JNum(raw)
    }
  }
}
