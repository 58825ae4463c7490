package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar quantization (q161): the integer code table is oracle-checked;
  * this spec checks the property the codes exist for — dequantized
  * values reconstruct the input to within half a quantization step per
  * dimension. */
class EmbedQuantizeSpec extends AnyFunSuite {
  import TestSession._

  test("int8 codes reconstruct within half a step per dimension") {
    val dims = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .withColumn("x", col("xf").cast("double"))
    val stats = dims.groupBy(col("i"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val worst = dims.join(broadcast(stats), "i")
      .filter(col("hi") > col("lo"))
      .withColumn("step", (col("hi") - col("lo")) / 255.0)
      .withColumn("q", least(
        floor((col("x") - col("lo")) / col("step") + 0.5), lit(255L)))
      .withColumn("deq", col("lo") + col("q") * col("step"))
      .select(max(abs(col("x") - col("deq")) / col("step")).as("worst"))
      .collect()(0).getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"worst error $worst steps")
  }
}
