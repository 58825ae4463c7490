package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Isotonic regression (q309): the distributed minimax closed form
  * must equal the classic pool-adjacent-violators algorithm — a
  * genuinely different algorithm (sequential block merging vs O(n^2)
  * interval-mean max-min), so agreement pins both the math and the
  * window mechanics. Cross-engine value equality goes through the
  * DuckDB gate. */
class IsotonicSpec extends AnyFunSuite {
  import TestSession._

  /** Reference: pool-adjacent-violators for a non-decreasing fit. */
  private def pav(xs: Array[Double]): Array[Double] = {
    case class Block(var sum: Double, var n: Int) {
      def mean: Double = sum / n
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (x <- xs) {
      blocks += Block(x, 1)
      while (blocks.length >= 2 &&
          blocks(blocks.length - 2).mean >= blocks.last.mean) {
        val last = blocks.remove(blocks.length - 1)
        blocks.last.sum += last.sum
        blocks.last.n += last.n
      }
    }
    blocks.iterator.flatMap(b => Iterator.fill(b.n)(b.mean)).toArray
  }

  test("q309: minimax fit equals pool-adjacent-violators per series") {
    val out = queries.Stats.queries("q309_isotonic")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(out.nonEmpty)
    for ((et, rows) <- out) {
      val sorted = rows.sortBy(_.getAs[java.sql.Date]("d").toString)
      val xs = sorted.map(_.getAs[Long]("x").toDouble)
      val want = pav(xs)
      val got = sorted.map(_.getAs[Double]("fit"))
      for (i <- xs.indices)
        assert(math.abs(got(i) - want(i)) < 1e-6,
          s"$et[$i]: minimax ${got(i)} != PAV ${want(i)}")
      // the defining constraint: fits are non-decreasing
      for (i <- 1 until got.length)
        assert(got(i) >= got(i - 1) - 1e-9, s"$et: fit not monotone at $i")
      // block means preserve the total (projection property)
      assert(math.abs(got.sum - xs.sum) < 1e-6)
    }
  }

  test("pav reference: textbook pooling") {
    // Barlow et al. example shape: a violation pools into the mean
    assert(pav(Array(1, 3, 2, 4)).toSeq == Seq(1.0, 2.5, 2.5, 4.0))
    assert(pav(Array(5, 4, 3)).toSeq == Seq(4.0, 4.0, 4.0))
    assert(pav(Array(1, 2, 3)).toSeq == Seq(1.0, 2.0, 3.0))
  }
}
