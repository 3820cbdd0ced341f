package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Integer top-level-field lookup in a JSON OBJECT string — the hot
  * `get_json_object(props, '$.key')` + int cast shape of the events
  * queries, without the per-row Jackson parser that spelling pays
  * (reference: the events props are tiny flat objects; the parse
  * dominated the whole scan at the 100× probe). Semantics mirror the
  * builtin composition on JSON objects: the value of the FIRST
  * occurrence of `key` at the top level, if it is an integer literal
  * (or a quoted integer string, which the string→int cast accepts)
  * that fits in INT — else NULL; malformed JSON, missing key, floats,
  * exponents, booleans, nulls, nested values → NULL, exactly where the
  * cast of the builtin's string result nulls out. A single left-to-
  * right scan; nested values are skipped structurally (depth counter,
  * string-aware), never parsed. */
case class JsonIntFieldExpression(child: Expression, key: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_int_field"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = JsonIntFieldExpression.compute(v.asInstanceOf[UTF8String], key)
      if (r == JsonIntFieldExpression.Missing) null
      else java.lang.Integer.valueOf(r.toInt)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("jint")
    val keyRef = ctx.addReferenceObj("jsonKey", key, "java.lang.String")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        long $tmp = graft.functions.JsonIntFieldExpression.compute(${c.value}, $keyRef);
        if ($tmp != Long.MIN_VALUE) { ${ev.isNull} = false; ${ev.value} = (int) $tmp; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonIntFieldExpression =
    copy(child = newChild)
}

object JsonIntFieldExpression {
  /** Sentinel for "no int value" (never a valid INT result). */
  final val Missing: Long = Long.MinValue

  def compute(u: UTF8String, key: String): Long = {
    val s = u.toString
    val n = s.length
    var i = skipWs(s, 0)
    if (i >= n || s.charAt(i) != '{') return Missing
    i = skipWs(s, i + 1)
    if (i < n && s.charAt(i) == '}') return Missing
    val kb = new java.lang.StringBuilder
    while (i < n) {
      if (s.charAt(i) != '"') return Missing
      kb.setLength(0)
      i = parseString(s, i, kb)
      if (i < 0) return Missing
      i = skipWs(s, i)
      if (i >= n || s.charAt(i) != ':') return Missing
      i = skipWs(s, i + 1)
      if (i >= n) return Missing
      if (kb.toString == key) return parseIntValue(s, i)
      i = skipValue(s, i)
      if (i < 0) return Missing
      i = skipWs(s, i)
      if (i >= n) return Missing
      if (s.charAt(i) == ',') i = skipWs(s, i + 1)
      else return Missing // '}' (key absent) or malformed
    }
    Missing
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  /** `i` at an opening quote; appends the unescaped content to `out`
    * and returns the index after the closing quote, or -1. */
  private def parseString(s: String, at: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = at + 1
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') return i + 1
      else if (c == '\\') {
        if (i + 1 >= n) return -1
        s.charAt(i + 1) match {
          case '"' => out.append('"'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '/' => out.append('/'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'u' =>
            if (i + 5 >= n) return -1
            var cp = 0
            var k = i + 2
            while (k < i + 6) {
              val h = Character.digit(s.charAt(k), 16)
              if (h < 0) return -1
              cp = (cp << 4) | h
              k += 1
            }
            out.append(cp.toChar); i += 6
          case _ => return -1
        }
      } else { out.append(c); i += 1 }
    }
    -1
  }

  /** Value start at `i`: return the first index past the value, or -1. */
  private def skipValue(s: String, at: Int): Int = {
    val n = s.length
    if (at >= n) return -1
    s.charAt(at) match {
      case '"' =>
        // structural skip; escapes matter, content does not
        var i = at + 1
        while (i < n) {
          val c = s.charAt(i)
          if (c == '"') return i + 1
          if (c == '\\') i += 2 else i += 1
        }
        -1
      case '{' | '[' =>
        var depth = 0
        var i = at
        var inStr = false
        while (i < n) {
          val c = s.charAt(i)
          if (inStr) {
            if (c == '\\') i += 1
            else if (c == '"') inStr = false
          } else c match {
            case '"' => inStr = true
            case '{' | '[' => depth += 1
            case '}' | ']' => depth -= 1; if (depth == 0) return i + 1
            case _ =>
          }
          i += 1
        }
        -1
      case _ =>
        // number / true / false / null: token chars
        var i = at
        while (i < n && "+-.eE0123456789truefalsn".indexOf(s.charAt(i)) >= 0) i += 1
        if (i == at) -1 else i
    }
  }

  /** Target value at `i`: the INT result, or [[Missing]]. */
  private def parseIntValue(s: String, at: Int): Long = {
    val n = s.length
    s.charAt(at) match {
      case '"' =>
        val sb = new java.lang.StringBuilder
        if (parseString(s, at, sb) < 0) Missing
        else parseCastInt(sb.toString)
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var i = at + (if (c == '-') 1 else 0)
        val ds = i
        while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
        if (i == ds) return Missing // bare '-'
        // an integer literal only: a following . e E makes it a float
        if (i < n && (s.charAt(i) == '.' || s.charAt(i) == 'e' || s.charAt(i) == 'E'))
          return Missing
        parseCastInt(s.substring(at, i))
      case _ => Missing // true/false/null/object/array
    }
  }

  /** The string→int cast the builtin composition applies to the
    * extracted text: optional surrounding whitespace, optional sign,
    * digits, INT range — else null. */
  private def parseCastInt(t: String): Long = {
    var a = 0
    var b = t.length
    while (a < b && Character.isWhitespace(t.charAt(a))) a += 1
    while (b > a && Character.isWhitespace(t.charAt(b - 1))) b -= 1
    if (a >= b) return Missing
    var i = a
    var neg = false
    t.charAt(i) match {
      case '-' => neg = true; i += 1
      case '+' => i += 1
      case _ =>
    }
    if (i >= b) return Missing
    var v = 0L
    while (i < b) {
      val c = t.charAt(i)
      if (c < '0' || c > '9') return Missing
      v = v * 10 + (c - '0')
      if (v > Int.MaxValue.toLong + 1) return Missing
      i += 1
    }
    val signed = if (neg) -v else v
    if (signed < Int.MinValue || signed > Int.MaxValue) Missing else signed
  }
}

object JsonIntField {
  def apply(c: Column, key: String): Column =
    GraftSqlBridge.column(
      JsonIntFieldExpression(GraftSqlBridge.expression(c), key))
}
