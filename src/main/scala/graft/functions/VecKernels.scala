package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd vector kernels for the similarity family (round 17;
  * the [[MinHashSigExpression]]/[[IvfKernels]] UDF→Expression ladder
  * applied to the last interpreted hot path left in the menu). The
  * `aggregate(zip_with(...))` HOF spelling of the dot/L2 folds runs on
  * Catalyst's interpreted higher-order path: per CALL it allocates the
  * zipped intermediate array and evaluates two lambda closures per
  * element with boxed doubles — and the cosine verify evaluates three
  * such folds per CANDIDATE PAIR, the multiprobe/bucket blocking`s
  * hottest loop and a steady allocation source feeding exactly the GC
  * sensitivity this mark family keeps paying under driver sweeps
  * (sim_embed_dedup_mp's r16 blowup class). These kernels do the same
  * folds in one codegen-callable pass over the unsafe array data: zero
  * intermediate allocation, no boxing (one boxed Double per call on the
  * nullable dot/L2 path), primitive element reads.
  *
  * Arithmetic parity (the property the DuckDB oracles arbitrate): every
  * fold accumulates LEFT-TO-RIGHT in doubles from 0.0 over double-cast
  * float elements — operation-for-operation the order of the HOF
  * spelling (`aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) *
  * CAST(y AS DOUBLE)), 0.0, (s, v) -> s + v)`) and of the oracle's
  * `list_reduce(list_prepend(...))` twin, so the IEEE doubles are
  * bit-identical and the driver's value-hash is unchanged
  * ([[graft.VecKernelsSpec]] pins bit-equality against the HOF
  * spelling property-style).
  *
  * Null semantics mirror the HOF spellings exactly:
  *  - dot/L2: a null array operand → null (BinaryExpression contract);
  *    mismatched lengths or a null element → null (zip_with pads with
  *    null, null poisons the product and then the running sum).
  *  - bucket: the CASE-guarded sign sum (`CASE WHEN planeDot > 0 THEN
  *    2^p ELSE 0 END`) maps a null/mismatched embedding to bucket 0,
  *    NOT null — every per-plane CASE falls to its ELSE. The bucket
  *    expression is therefore non-nullable, like the spelling it
  *    replaces.
  */
object VecKernels {

  /** Left-fold double dot product; boxed null on length mismatch or a
    * null element (see object scaladoc). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Left-fold squared L2, same contract as [[dot]]. */
  def l2(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Sign-bit bucket over the first `np` hyperplanes of the row-major
    * `planesFlat` (which holds at least np × dim doubles, ±1
    * components). A mismatched length or null element zeroes every
    * plane term (CASE → ELSE 0), so the bucket reads 0 — never null. */
  def bucket(e: ArrayData, np: Int, planesFlat: Array[Double], dim: Int): Int = {
    if (e.numElements() != dim) return 0
    var i = 0
    while (i < dim) { if (e.isNullAt(i)) return 0; i += 1 }
    var b = 0
    var p = 0
    while (p < np) {
      var s = 0.0
      val off = p * dim
      var j = 0
      while (j < dim) { s += e.getFloat(j).toDouble * planesFlat(off + j); j += 1 }
      if (s > 0) b |= 1 << p
      p += 1
    }
    b
  }

  private[functions] def checkFloatArray(name: String, t: DataType): TypeCheckResult =
    t match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float>, got $other")
    }
}

/** `dot(a, b)` — see [[VecKernels.dot]]. */
case class VecDotExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecKernels.checkFloatArray(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecKernels.checkFloatArray(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on mismatch/null element
  override def prettyName: String = "graft_vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""java.lang.Double $tmp = graft.functions.VecKernels.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDotExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `squared_l2(a, b)` — see [[VecKernels.l2]]. */
case class VecL2Expression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecKernels.checkFloatArray(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecKernels.checkFloatArray(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_l2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("l2")
      s"""java.lang.Double $tmp = graft.functions.VecKernels.l2($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Expression =
    copy(left = newLeft, right = newRight)
}

object VecL2 {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecL2Expression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `bucket(embedding)` over the caller's hyperplane matrix — see
  * [[VecKernels.bucket]]. Non-nullable by the CASE-sum argument above.
  *
  * Construction guards (round-18 advice): `np` feeds `1 << p`, which
  * silently wraps past 31 bits, and an undersized `planesFlat` would
  * only surface as a mid-query ArrayIndexOutOfBounds — both fail here
  * instead. Equality is STRUCTURAL over the planes content (round-18
  * advice): a case class with an Array field compares the array by
  * reference, so semanticEquals/canonicalization (subexpression
  * elimination, exchange reuse after a serialization round-trip) only
  * worked while every caller shared one planesFlat instance; the
  * overrides below compare content, making plan reuse independent of
  * the caller's allocation. */
case class PlanesBucketExpression(child: Expression, np: Int,
    planesFlat: Array[Double], dim: Int) extends UnaryExpression {
  require(np >= 0 && np <= 31 && dim >= 0 && planesFlat.length >= np * dim,
    s"graft_planes_bucket: need 0 <= np <= 31 and planesFlat.length >= np * dim, " +
      s"got np=$np, dim=$dim, planesFlat.length=${planesFlat.length}")
  override def equals(other: Any): Boolean = other match {
    case PlanesBucketExpression(c, n, p, d) =>
      c == child && n == np && d == dim &&
        java.util.Arrays.equals(p, planesFlat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(np),
      Integer.valueOf(java.util.Arrays.hashCode(planesFlat)),
      Integer.valueOf(dim))
  override def checkInputDataTypes(): TypeCheckResult =
    VecKernels.checkFloatArray(prettyName, child.dataType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_planes_bucket"
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else VecKernels.bucket(v.asInstanceOf[ArrayData], np, planesFlat, dim)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      int ${ev.value} = ${c.isNull} ? 0 :
        graft.functions.VecKernels.bucket(${c.value}, $np, $pRef, $dim);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): PlanesBucketExpression =
    copy(child = newChild)
}

object PlanesBucket {
  def apply(c: Column, np: Int, planesFlat: Array[Double], dim: Int): Column =
    GraftSqlBridge.column(PlanesBucketExpression(
      GraftSqlBridge.expression(c), np, planesFlat, dim))
}
