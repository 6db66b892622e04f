package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the embedding hot paths.
 *
 * The dedup/ANN suite (q20/q21/q24/q27, `dedup/NearDup`) originally
 * computed dot products, norms and sign-random-projection buckets with
 * SQL higher-order functions — `aggregate(zip_with(...))`. Those HOF
 * expressions are `CodegenFallback` in Spark (interpreted lambda
 * dispatch) and `zip_with` materializes an intermediate array per row;
 * an SRP bucket of B bits pays that B times per vector. At 10^9 vectors
 * the per-row allocations dominate the scan.
 *
 * These expressions fuse each computation into one primitive loop over
 * the `ArrayData` with full `doGenCode` support, so they stay inside
 * WholeStageCodegen. Accumulation ORDER is the same left fold the SQL
 * `aggregate` performs, so results are bit-identical to the HOF forms —
 * VectorExprSpec pins `doubleToRawLongBits` equality on both the
 * codegen and interpreted paths.
 *
 * Null semantics mirror the HOF forms exactly:
 *  - `VecDot`/`VecL2Sq`: any null element, or a length mismatch
 *    (zip_with pads with null), nulls the whole result; empty arrays
 *    fold to 0.0.
 *  - `SrpBucket`: a null projection makes `when(proj >= 0, bit)` take
 *    the `otherwise(0)` branch, so a null element, a null array, or an
 *    EMPTY array (where `sequence(0, size-1)` = [0,-1] pads the zip
 *    with nulls, nulling the projection) yields bucket 0, never null.
 *    A NaN projection (e.g. an Inf element times a zero hyperplane
 *    weight) SETS the bit: Spark SQL orders NaN greater than every
 *    value, so `NaN >= 0` is true — mirrored with `!(s < 0.0)`, since
 *    Java's `NaN >= 0.0` is false.
 *
 * Registered for SQL users as `vec_dot` / `vec_l2sq` / `srp_bucket` via
 * [[GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`);
 * Scala callers use the [[vec]] Column helpers directly (no registry
 * needed).
 */
object VectorExpressions {

  /** float/double array check shared by the expressions' type contracts
   *  (TypeCollection is private[sql] — hand-rolled equivalent). */
  private[functions] def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private[functions] def checkNumericArrays(
      name: String, dts: Seq[DataType]): TypeCheckResult =
    dts.find(!isNumericArray(_)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got ${bad.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Java accessor snippet for element `i` of `arr`, widened to double. */
  private[functions] def getter(et: DataType, arr: String, i: String): String =
    et match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalStateException(s"unsupported $other")
    }

  private[functions] def elemAt(et: DataType, arr: ArrayData, i: Int): Double =
    et match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalStateException(s"unsupported $other")
    }
}

/** Shared shape of the two fused binary folds (dot product / squared L2):
 *  same type contract, same null semantics, different per-element term. */
abstract class VecFold extends BinaryExpression {
  import VectorExpressions._

  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArrays(prettyName, Seq(left.dataType, right.dataType))
  override def dataType: DataType = DoubleType
  // null even for non-null inputs: length mismatch / null element
  override def nullable: Boolean = true

  // lazy vals: the interpreted path reads these per ELEMENT — a def would
  // re-pay the cast + match every iteration
  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  /** The fused per-element term, interpreted path. */
  protected def term(x: Double, y: Double): Double
  /** The fused per-element term, Java source. */
  protected def termCode(x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += term(elemAt(leftElem, a, i), elemAt(rightElem, b, i))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = getter(leftElem, a, i)
      val y = getter(rightElem, b, i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${termCode(x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Fused dot product over two numeric arrays; `VecDot(e, e)` is the
 *  squared norm. Replaces
 *  `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)), 0d, (acc,v) -> acc+v)`. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Fused squared-L2 distance over two numeric arrays. Replaces
 *  `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d, (acc,v) -> acc+v)`. */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def termCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** One-pass sign-random-projection bucket id over a numeric array: bit j
 *  is set iff `sum_i x_i * ((i*31 + j*17) % 7 - 3)` >= 0 — the fixed
 *  pseudo-hyperplane family of `NearDup.embeddingCosine` / q21, computed
 *  in a single pass instead of `bits` separate HOF folds (each of which
 *  materialized a zipped intermediate array per row). */
case class SrpBucket(child: Expression, bits: Int)
  extends UnaryExpression {
  import VectorExpressions._

  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArrays(prettyName, Seq(child.dataType))
  override def dataType: DataType = IntegerType
  // the HOF form's when/otherwise never yields null (see object scaladoc)
  override def nullable: Boolean = false

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return 0 // HOF form: sequence pads the zip -> null proj -> 0
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0; i += 1 }
    var bucket = 0
    var j = 0
    while (j < bits) {
      var s = 0.0
      i = 0
      while (i < n) {
        s += elemAt(elem, a, i) * (((i * 31 + j * 17) % 7).toDouble - 3.0)
        i += 1
      }
      if (!(s < 0.0)) bucket |= 1 << j // NaN sets the bit, like Spark's >=
      j += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val a = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val ok = ctx.freshName("noNulls")
    val x = getter(elem, a, i)
    ev.copy(isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        |${c.code}
        |int ${ev.value} = 0;
        |if (!${c.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
        |  final int $n = $a.numElements();
        |  boolean $ok = $n > 0; // empty array -> bucket 0 (HOF parity)
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i)) { $ok = false; break; }
        |  }
        |  if ($ok) {
        |    for (int $j = 0; $j < $bits; $j++) {
        |      double $s = 0.0;
        |      for (int $i = 0; $i < $n; $i++) {
        |        $s += $x * ((double) (($i * 31 + $j * 17) % 7) - 3.0);
        |      }
        |      if (!($s < 0.0)) ${ev.value} |= (1 << $j); // NaN sets (Spark >=)
        |    }
        |  }
        |}
      """.stripMargin)
  }

  override def prettyName: String = "srp_bucket"
  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** Scala-side Column helpers — the graft library's own call sites use
 *  these; no function-registry registration required. */
object vec {
  import GraftSqlShim.{column, expression}

  def dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  /** Squared norm = self dot product (one fused pass). */
  def normSq(a: Column): Column = dot(a, a)

  def l2sq(a: Column, b: Column): Column =
    column(VecL2Sq(expression(a), expression(b)))

  def srpBucket(a: Column, bits: Int): Column =
    column(SrpBucket(expression(a), bits))
}
