package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed
  * from higher-order builtin functions (zip_with/transform/aggregate)
  * so the arithmetic runs inside codegen with no UDF boundary.
  *
  * All arithmetic is widened to double with a strict left-to-right
  * fold, making results reproducible and engine-portable.
  */
object VectorFunctions {

  /** Left-to-right fold sum of a double array. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def normSq(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Random-hyperplane LSH bucket: `planes` sign bits packed into a
    * long. Plane j's direction for dimension d comes from portable
    * integer arithmetic ((j*10007+d)*2654435761 mod p mod 2), so
    * buckets are stable across runs AND engines with no stored model. */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    // sign_j = sum_d v[d] * dir(j, d), dir in {-1, +1}
    val signs = transform(sequence(lit(0), lit(planes - 1)), j =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, d) =>
          v.cast("double") *
            (pmod(pmod((j.cast("long") * lit(10007L) + d.cast("long"))
              * lit(2654435761L), lit(2147483647L)), lit(2L))
              .cast("double") * 2.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x))
    // pack sign bits most-significant-first: acc*2 + (s>0)
    aggregate(signs, lit(0L),
      (acc, s) => acc * lit(2L) + when(s > 0, 1L).otherwise(0L))
  }
}
