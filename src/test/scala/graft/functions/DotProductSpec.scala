package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite

/** Native dot-product expression: bit-identity with the
  * aggregate(zip_with(...)) fold it replaced, null semantics, codegen.
  */
class DotProductSpec extends SparkSuite {
  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the higher-order-function fold on float arrays") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
        DotProduct($"a", $"b").as("native"), foldDot($"a", $"b").as("fold"))
      .as[(Double, Double)].collect()
    // exact comparison on the raw bits — same fold order, same widening
    out.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f))
    }
  }

  test("mixed float/double element types widen like the fold") {
    val df = Seq((Array(1.5f, -2.0f), Array(2.0, 3.0))).toDF("a", "b")
    val got = df.select(DotProduct($"a", $"b")).as[Double].head()
    assert(got == 1.5 * 2.0 + -2.0 * 3.0)
  }

  test("null array, length mismatch, and null element all yield NULL") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f))),
      (2L, None, Some(Array(1.0f))),
      (3L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (4L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f)))
    ).toDF("id", "a", "b")
      // inject a null ELEMENT for id=4 via an array constructor
      .withColumn("b", when($"id" === 4,
        array(lit(1.0f), lit(null).cast("float"))).otherwise($"b"))
    val out = df.select($"id", DotProduct($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(5.0))
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(array($"id".cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), $"id".cast("float")).as("b"))
      .select(DotProduct(col("a"), col("b")).as("d"))
    // `*(n)` stage markers == WholeStageCodegen; the expression must not
    // fall back to an interpreted Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().toSeq ==
      (0 until 10).map(i => 3.0 * i + 2.0 * i))
  }
}
