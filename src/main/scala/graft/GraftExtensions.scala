package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SrpBucket, VecDot, VecL2Sq}

/**
 * SparkSessionExtensions entry point for the graft library: registers
 * the native vector expressions (`functions/VectorExpressions.scala`)
 * under SQL names, so `spark.sql` users get the same fused codegen'd
 * kernels the Scala API uses.
 *
 * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
 * (or `--conf` on spark-submit); Bench/Verify/Main sessions do.
 *
 *   vec_dot(a, b)      fused dot product over array<float|double>
 *   vec_l2sq(a, b)     fused squared-L2 distance
 *   srp_bucket(a, B)   one-pass B-bit sign-random-projection bucket
 *                      (B a foldable integer literal, 1..31)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", classOf[VecDot]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
        VecDot(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", classOf[VecL2Sq]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_l2sq(a, b) takes exactly 2 arguments")
        VecL2Sq(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("srp_bucket"),
      info("srp_bucket", classOf[SrpBucket]),
      (args: Seq[Expression]) => {
        require(args.length == 2, "srp_bucket(a, bits) takes exactly 2 arguments")
        // any foldable integer works (8+4, CAST(12 AS INT), a BIGINT
        // literal) — the docs promise "foldable", not "bare literal"
        val bits = args(1) match {
          case e if e.resolved && e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case other => throw new IllegalArgumentException(
              s"srp_bucket bits must be an integer, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"srp_bucket bits must be a foldable integer expression, got $other")
        }
        SrpBucket(args(0), bits)
      }))
  }
}
