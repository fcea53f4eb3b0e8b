package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.GraftBridge
import graft.functions.{IvfCellE12, QuantizedDotE12}

/** The codegen'd embedding kernels must be BIT-identical to the
  * interpreted HOF forms they replace — on the real embeddings table and
  * on adversarial values (negatives, near-tie products, mixed signs). */
class EmbeddingKernelSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def qdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftBridge.column(QuantizedDotE12(GraftBridge.expression(a), GraftBridge.expression(b)))

  private val hofDot =
    "aggregate(zip_with(e1, e2, (x, y) -> CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  test("QuantizedDotE12 == HOF quantized dot on the embeddings table") {
    val e = Tables.embeddings(spark, sfDir)
    val pairs = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      .crossJoin(e.filter(col("vec_id") < 8).select(col("vec_id").as("v2"), col("embedding").as("e2")))
    val diff = pairs
      .withColumn("a", qdot(col("e1"), col("e2")))
      .withColumn("b", expr(hofDot))
      .filter(col("a") =!= col("b") || col("a").isNull =!= col("b").isNull)
    assert(diff.isEmpty, s"mismatches: ${diff.count()}")
  }

  test("QuantizedDotE12 == HOF on adversarial values (negatives, ties, zero)") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map { _ =>
      (Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f),
       Array.fill(16)((rnd.nextFloat() - 0.5f) * 4f))
    } :+ ((Array.fill(16)(0f), Array.fill(16)(0f))) :+
      ((Array.fill(16)(-1f), Array.fill(16)(1f)))
    val df = rows.toDF("e1", "e2")
    val diff = df.withColumn("a", qdot(col("e1"), col("e2")))
      .withColumn("b", expr(hofDot))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
    // length mismatch -> null (zip_with null-padding parity)
    val mm = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("e1", "e2")
      .select(qdot(col("e1"), col("e2")).as("a"), expr(hofDot).as("b"))
      .collect()(0)
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("IvfCellE12 == nested-HOF argmin on the embeddings table") {
    val cents = graft.sim.Ivf.trainCentroids(spark, sfDir, k = 8)
    val e = Tables.embeddings(spark, sfDir)
    val a = graft.sim.Ivf.withCell(e, cents).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = graft.sim.Ivf.withCellHof(e, cents).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    // and the kernel runs inside whole-stage codegen (the "*(n)" stage
    // marker on the Project that evaluates it — no codegen fallback)
    val plan = graft.sim.Ivf.withCell(e, cents).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("ivf_cell_e12") && l.trim.startsWith("*(")),
      plan.take(800))
  }
}
