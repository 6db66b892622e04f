package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.functions.{vec, SrpBucket, VecDot, VecL2Sq}

/** The native vector expressions must be BIT-IDENTICAL to the SQL
 *  higher-order-function folds they replaced (dedup/NearDup, q20/q21) —
 *  the driver's DuckDB oracles hash the exact doubles, so "close" is a
 *  regression. Both execution paths are pinned: the codegen'd DataFrame
 *  path and the interpreted eval() path. */
class VectorExprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic "random" float arrays incl. negatives and magnitudes
  private def arr(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(i => (((seed * 1103515245 + i * 12345) % 1000) - 500) / 37.0f)

  private val dims = Seq(1, 7, 16, 33)
  // repartition(2): without a shuffle barrier the optimizer constant-folds
  // the projection into a LocalTableScan (interpreted eval) — the point of
  // this suite is to pin the CODEGEN path, so force a real stage
  private lazy val pairs = spark.createDataFrame(
    dims.zipWithIndex.map { case (d, i) => (i.toLong, arr(i + 1, d), arr(i + 7, d)) }
  ).toDF("id", "a", "b").repartition(2)

  private val hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
  private val hofNormSq = expr(
    "aggregate(a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
  private val hofL2 = expr(
    "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  test("vec_dot / normSq / l2sq are bit-identical to the HOF folds (codegen path)") {
    val rows = pairs.select(
      vec.dot($"a", $"b").as("nd"), hofDot.as("hd"),
      vec.normSq($"a").as("nn"), hofNormSq.as("hn"),
      vec.l2sq($"a", $"b").as("nl"), hofL2.as("hl")).collect()
    assert(rows.length == dims.length)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), "dot")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), "normSq")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)), "l2sq")
    }
  }

  test("srp_bucket matches the per-bit HOF fold for every bit width used") {
    for (bits <- Seq(8, 12)) {
      val hofBits = (0 until bits).map { j =>
        val proj = expr(
          s"""aggregate(zip_with(a, sequence(0, size(a)-1),
              (x, i) -> CAST(x AS DOUBLE) * (CAST((i * 31 + $j * 17) % 7 AS DOUBLE) - 3.0)),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
        when(proj >= 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      val rows = pairs.select(vec.srpBucket($"a", bits).as("n"),
        hofBits.as("h")).collect()
      rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"bits=$bits"))
    }
  }

  test("null semantics mirror zip_with/aggregate: null element or length mismatch -> null dot; empty -> 0.0") {
    val df = spark.sql(
      """SELECT * FROM VALUES
         (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), NULL)),
         (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))),
         (array(CAST(1.0 AS FLOAT)), CAST(NULL AS ARRAY<FLOAT>)),
         (CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS t(a, b)""")
    val got = df.select(vec.dot($"a", $"b").as("d"), hofDot.as("h")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(got.count(_.isNullAt(0)) == 3)
    // srp_bucket: null element / null array / EMPTY array -> 0 — the HOF
    // form's sequence(0, size-1) on an empty array is [0,-1], padding the
    // zip with nulls, so every projection is null -> otherwise(0)
    val sb = df.select(vec.srpBucket($"b", 4).as("s")).collect().map(_.getInt(0))
    assert(sb(0) == 0 && sb(2) == 0 && sb(3) == 0)
  }

  test("srp_bucket HOF parity on the degenerate inputs: empty array and NaN projections") {
    // empty array, and [Inf] (hyperplane weight 0 at i=0 for some j ->
    // Inf * 0.0 = NaN projection; Spark SQL orders NaN >= 0 as TRUE)
    val df = spark.sql(
      """SELECT * FROM VALUES
         (CAST(array() AS ARRAY<FLOAT>)),
         (array(CAST('Infinity' AS FLOAT))),
         (array(CAST('-Infinity' AS FLOAT), CAST('Infinity' AS FLOAT))) AS t(a)""")
      .repartition(2) // force codegen, not LocalTableScan constant folding
    val bits = 6
    val hofBits = (0 until bits).map { j =>
      val proj = expr(
        s"""aggregate(zip_with(a, sequence(0, size(a)-1),
            (x, i) -> CAST(x AS DOUBLE) * (CAST((i * 31 + $j * 17) % 7 AS DOUBLE) - 3.0)),
            CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val rows = df.select(vec.srpBucket($"a", bits).as("n"), hofBits.as("h"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"native ${r.getInt(0)} != hof ${r.getInt(1)}"))
  }

  test("interpreted eval path agrees with codegen (direct Expression.eval)") {
    val a = arr(3, 9); val b = arr(11, 9)
    val row = InternalRow(ArrayData.toArrayData(a.toArray),
      ArrayData.toArrayData(b.toArray))
    val at = ArrayType(FloatType, containsNull = true)
    val dotE = VecDot(BoundReference(0, at, nullable = true),
      BoundReference(1, at, nullable = true))
    val l2E = VecL2Sq(BoundReference(0, at, nullable = true),
      BoundReference(1, at, nullable = true))
    val srpE = SrpBucket(BoundReference(0, at, nullable = true), 12)
    val expDot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble }
    assert(java.lang.Double.doubleToRawLongBits(
      dotE.eval(row).asInstanceOf[Double]) ==
      java.lang.Double.doubleToRawLongBits(expDot))
    val expL2 = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      val d = x.toDouble - y.toDouble; acc + d * d }
    assert(l2E.eval(row).asInstanceOf[Double] == expL2)
    var expBucket = 0
    for (j <- 0 until 12) {
      var s = 0.0
      for (i <- a.indices) s += a(i).toDouble * (((i * 31 + j * 17) % 7) - 3.0)
      if (s >= 0.0) expBucket |= 1 << j
    }
    assert(srpE.eval(row) == expBucket)
    // and a literal-children sanity check through the interpreted path
    assert(VecDot(Literal.create(Seq(2.0f, 3.0f), at),
      Literal.create(Seq(4.0f, 5.0f), at)).eval() == 23.0)
  }

  test("GraftExtensions registers vec_dot/vec_l2sq/srp_bucket for SQL users") {
    val got = spark.sql(
      """SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
                        array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
                vec_l2sq(array(CAST(1.0 AS DOUBLE)), array(CAST(4.0 AS DOUBLE))) AS l,
                srp_bucket(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)), 3) AS s""")
      .collect()(0)
    assert(got.getDouble(0) == 1.5 * 4.0 + (-2.0 * 0.5))
    assert(got.getDouble(1) == 9.0)
    // hand-computed: j=0: (0%7-3)+(31%7-3) = -3+0 < 0;
    // j=1: (17%7-3)+(48%7-3) = 0+3 >= 0; j=2: (34%7-3)+(65%7-3) = 3-1 >= 0
    // -> bits 1,2 -> 6
    assert(got.getInt(2) == 6)
  }

  test("the fused kernels stay inside WholeStageCodegen (no CodegenFallback)") {
    val df = pairs.select(vec.dot($"a", $"b").as("d"),
      vec.srpBucket($"a", 8).as("s"))
    df.collect() // AQE prints "*(n)" markers only once the final plan ran
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    // and, unlike the HOF folds they replaced (ArrayAggregate/ZipWith are
    // CodegenFallback), the native expressions really generate code
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[VecDot]))
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[VecL2Sq]))
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[SrpBucket]))
  }
}
