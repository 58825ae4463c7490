package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall of the approximate ANN paths against the exact brute-force
  * baseline (q196) on the same query set — the quality number an ANN
  * index is judged by. LSH with 4 hyperplanes probes 1/16 of the
  * corpus and IVF probes nprobe/nlist = 1/4, so neither should be
  * anywhere near zero; the floors here are deliberately loose (they
  * guard against a broken index, not a tuned one). */
class AnnRecallSpec extends AnyFunSuite {
  import TestSession._

  private def topPairs(q: String): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, sfDir)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF and LSH recall vs the exact baseline") {
    val exact = topPairs("q196_bruteforce_topk")
    assert(exact.nonEmpty)
    val ivf = topPairs("q101_ann_ivf")
    val lsh = topPairs("q54_ann_lsh")
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    val lshRecall = (lsh & exact).size.toDouble / exact.size
    info(f"IVF recall@5 = $ivfRecall%.3f, LSH recall@5 = $lshRecall%.3f")
    // measured on this corpus: IVF (nprobe=2/16) ~0.86; multi-probe
    // LSH (5/16 buckets) ~0.5-0.6 (single-probe was 0.14)
    assert(ivfRecall >= 0.4, f"IVF recall collapsed: $ivfRecall%.3f")
    assert(lshRecall >= 0.3, f"LSH recall collapsed: $lshRecall%.3f")
  }
}
