package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass strict-JSON flat-object parser: `{"k": v, ...}` →
  * `map<string,string>` with every scalar value as its literal token
  * text (float tokens canonicalized through double and int tokens
  * through long, exactly as `from_json`'s generator copy renders
  * them; `true`/`false` spelled out; JSON null → null value).
  * Malformed syntax or a non-object top level yields a NULL map, and
  * content after the closing brace is ignored, like `from_json`'s
  * PERMISSIVE mode. A NESTED
  * object/array value also yields null — that is the one documented
  * divergence: `from_json(map<string,string>)` stringifies the
  * subtree instead; payloads that nest should keep using `from_json`.
  * Flat property bags — the overwhelmingly common event-payload
  * case — are value-identical between the two (property-spec'd).
  *
  * Exists because `from_json` pays a Jackson parser + options
  * machinery per row; flat string-keyed property bags (the `props`
  * event column, reference's kline payload style) are the common case
  * and parse in one char scan with no intermediate tree. Strictly
  * RFC 8259 — unlike `from_json`, whose DEFAULT options also accept
  * single-quoted strings and other extensions, which is why this is a
  * separate function and NOT an automatic from_json rewrite rule; the
  * DuckDB oracle's json functions are strict, so catalog queries
  * using this are, if anything, closer to the oracle's dialect.
  * Duplicate keys are kept in encounter order, as JacksonParser's map
  * path does.
  */
object JsonMap {

  /** Parsed map, or null for anything not a flat JSON object. */
  def parse(s: UTF8String): MapData = {
    val str = s.toString
    val n = str.length
    var i = skipWs(str, 0)
    if (i >= n || str.charAt(i) != '{') return null
    i += 1
    val keys = new java.util.ArrayList[AnyRef](4)
    val vals = new java.util.ArrayList[AnyRef](4)
    i = skipWs(str, i)
    if (i < n && str.charAt(i) == '}') i += 1
    else {
      var done = false
      while (!done) {
        i = skipWs(str, i)
        if (i >= n || str.charAt(i) != '"') return null
        val kb = new java.lang.StringBuilder
        i = parseString(str, i, kb)
        if (i < 0) return null
        i = skipWs(str, i)
        if (i >= n || str.charAt(i) != ':') return null
        i = skipWs(str, i + 1)
        if (i >= n) return null
        var value: UTF8String = null
        var isNullValue = false
        str.charAt(i) match {
          case '"' =>
            val vb = new java.lang.StringBuilder
            i = parseString(str, i, vb)
            if (i < 0) return null
            value = UTF8String.fromString(vb.toString)
          case 't' =>
            if (!str.startsWith("true", i)) return null
            i += 4; value = TRUE
          case 'f' =>
            if (!str.startsWith("false", i)) return null
            i += 5; value = FALSE
          case 'n' =>
            if (!str.startsWith("null", i)) return null
            i += 4; isNullValue = true
          case c if c == '-' || (c >= '0' && c <= '9') =>
            val start = i
            i = parseNumber(str, i)
            if (i < 0) return null
            value = UTF8String.fromString(numberText(str.substring(start, i)))
          case _ => return null // nested object/array or garbage
        }
        keys.add(UTF8String.fromString(kb.toString))
        vals.add(if (isNullValue) null else value)
        i = skipWs(str, i)
        if (i < n && str.charAt(i) == ',') i += 1
        else if (i < n && str.charAt(i) == '}') { i += 1; done = true }
        else return null
      }
    }
    // content after the closing brace is ignored, as from_json does
    // (Jackson reads the first complete value and stops)
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray))
  }

  private val TRUE = UTF8String.fromString("true")
  private val FALSE = UTF8String.fromString("false")

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && {
      val c = s.charAt(i); c == ' ' || c == '\t' || c == '\n' || c == '\r'
    }) i += 1
    i
  }

  /** Parse a double-quoted JSON string starting at the opening quote;
    * appends the decoded chars to `out`, returns the index after the
    * closing quote, or -1 on malformation (bad escape, unescaped
    * control char, unterminated). */
  private def parseString(s: String, from: Int, out: java.lang.StringBuilder): Int = {
    var i = from + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') return i + 1
      if (c < 0x20) return -1
      if (c == '\\') {
        if (i + 1 >= n) return -1
        s.charAt(i + 1) match {
          case '"'  => out.append('"');  i += 2
          case '\\' => out.append('\\'); i += 2
          case '/'  => out.append('/');  i += 2
          case 'b'  => out.append('\b'); i += 2
          case 'f'  => out.append('\f'); i += 2
          case 'n'  => out.append('\n'); i += 2
          case 'r'  => out.append('\r'); i += 2
          case 't'  => out.append('\t'); i += 2
          case 'u' =>
            if (i + 6 > n) return -1
            var cp = 0
            var j = i + 2
            while (j < i + 6) {
              val h = Character.digit(s.charAt(j), 16)
              if (h < 0) return -1
              cp = (cp << 4) | h
              j += 1
            }
            out.append(cp.toChar)
            i += 6
          case _ => return -1
        }
      } else { out.append(c); i += 1 }
    }
    -1
  }

  /** Number token → the text `from_json` would produce for a
    * string-typed target: from_json copies non-string scalars through
    * a Jackson generator, which re-renders floats from their double
    * value (`-1.25e3` → `-1250.0`) and ints from their long/BigInteger
    * value (`-0` → `0`). Mirror that so the two functions agree on
    * every strict input. */
  private def numberText(raw: String): String = {
    var i = 0
    var isFloat = false
    while (i < raw.length && !isFloat) {
      val c = raw.charAt(i)
      if (c == '.' || c == 'e' || c == 'E') isFloat = true
      i += 1
    }
    if (isFloat) java.lang.Double.toString(java.lang.Double.parseDouble(raw))
    else try java.lang.Long.toString(java.lang.Long.parseLong(raw))
    catch { case _: NumberFormatException => new java.math.BigInteger(raw).toString }
  }

  /** Strict JSON number grammar: -?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?.
    * Returns index after the number, or -1. */
  private def parseNumber(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    if (i < n && s.charAt(i) == '-') i += 1
    if (i >= n) return -1
    if (s.charAt(i) == '0') i += 1
    else if (s.charAt(i) >= '1' && s.charAt(i) <= '9') {
      while (i < n && Character.isDigit(s.charAt(i))) i += 1
    } else return -1
    if (i < n && s.charAt(i) == '.') {
      i += 1
      if (i >= n || !Character.isDigit(s.charAt(i))) return -1
      while (i < n && Character.isDigit(s.charAt(i))) i += 1
    }
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      if (i >= n || !Character.isDigit(s.charAt(i))) return -1
      while (i < n && Character.isDigit(s.charAt(i))) i += 1
    }
    i
  }
}

/** `graft_json_map(text)` — [[JsonMap.parse]] as a codegen expression. */
case class JsonStringMapExpr(child: Expression) extends TextSketchExpr {
  override def prettyName: String = "graft_json_map"
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    JsonMap.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = graft.functions.JsonMap.parse($t);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
