package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ALIGN ... ON <dist> MARGIN <n> — the reference's banded
  * dynamic-time-warping stream alignment (reference:
  * sql/exec/relational/AlignTableResult.scala — a Sakoe-Chiba-band DP
  * minimizing cumulative distance over two ordered streams, emitting
  * the row pairs along the optimal warping path; sclera surfaces it
  * as the ALIGN join with a distance expression, SqlQueryParser.scala:
  * 163-171).
  *
  * Spark-first shape: the alignment DP is inherently sequential per
  * stream PAIR, so the distributed axis is the KEY — cogroup the two
  * sides per key and run the banded DP inside each group (the band
  * caps transitions per cell; state is the per-key DP table, bounded
  * because per-key sequences are the bounded dimension — exactly like
  * every other ordered-stream operator here: MATCH, sessionize,
  * as-of). Keys parallelize across executors.
  *
  * Step preference on cost ties is diagonal > advance-left >
  * advance-right, fixed so results are deterministic.
  */
object DtwAlign {

  /** One aligned path step. */
  private val outSchema = StructType(Seq(
    StructField("key", LongType),
    StructField("step", IntegerType),
    StructField("a_ord", LongType),
    StructField("b_ord", LongType),
    StructField("a_val", DoubleType),
    StructField("b_val", DoubleType),
    StructField("d", DoubleType)))

  /** Banded DTW over (ord, value) arrays; returns the optimal path as
    * (ai, bi) index pairs, first-to-last. Distance = |va - vb|. */
  private[graft] def dtwPath(
      a: Array[(Long, Double)], b: Array[(Long, Double)],
      margin: Option[Int]): Seq[(Int, Int)] = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Seq.empty
    // the band must admit a monotone path between unequal lengths
    val band = margin match {
      case Some(w) => math.max(math.max(1, w.abs), (n - m).abs)
      case None => math.max(n, m) // unbounded
    }
    val INF = Double.PositiveInfinity
    // BAND-LOCAL storage: column k = j - (i - band), so each row holds
    // only its 2*band+1 admissible cells — O(n * band) memory, never
    // the O(n * m) full matrix (long sequences with a small MARGIN
    // would otherwise OOM per key). In this layout the diagonal
    // predecessor (i-1, j-1) keeps the SAME k, up (i-1, j) is k+1,
    // left (i, j-1) is k-1 — backtrack pointers stay band-local.
    val w = 2 * band + 1
    val cost = Array.fill(n, w)(INF)
    val from = Array.fill(n, w)(-1) // 0 = diag, 1 = up (ai-1), 2 = left (bi-1)
    def d(i: Int, j: Int): Double = math.abs(a(i)._2 - b(j)._2)
    cost(0)(band) = d(0, 0) // k(0, 0) = band
    var i = 0
    while (i < n) {
      val jLo = math.max(0, i - band); val jHi = math.min(m - 1, i + band)
      var j = jLo
      while (j <= jHi) {
        val k = j - (i - band)
        if (i != 0 || j != 0) {
          // fixed tie preference: diag, then up, then left
          var best = INF; var arg = -1
          if (i > 0 && j > 0 && cost(i - 1)(k) < best) {
            best = cost(i - 1)(k); arg = 0
          }
          if (i > 0 && k + 1 < w && cost(i - 1)(k + 1) < best) {
            best = cost(i - 1)(k + 1); arg = 1
          }
          if (j > 0 && k - 1 >= 0 && cost(i)(k - 1) < best) {
            best = cost(i)(k - 1); arg = 2
          }
          if (arg >= 0) { cost(i)(k) = best + d(i, j); from(i)(k) = arg }
        }
        j += 1
      }
      i += 1
    }
    // backtrack from (n-1, m-1)
    val path = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var ci = n - 1; var cj = m - 1
    while (ci >= 0 && cj >= 0) {
      path += ((ci, cj))
      from(ci)(cj - (ci - band)) match {
        case 0 => ci -= 1; cj -= 1
        case 1 => ci -= 1
        case 2 => cj -= 1
        case _ => ci = -1; cj = -1 // at (0,0)
      }
    }
    path.reverse.toSeq
  }

  /** Align `left` and `right` per key: banded-DTW path rows
    * (key, step, a_ord, b_ord, a_val, b_val, d). Both sides are
    * ordered by `ordCol` within key; distance is |a_val - b_val|. */
  def align(left: DataFrame, right: DataFrame, keyCol: String,
      ordCol: String, valCol: String, margin: Option[Int]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    def prep(df: DataFrame) = df.select(
        col(keyCol).cast("long"),
        col(ordCol).cast("timestamp").cast("long"),
        col(valCol).cast("double"))
      .as[(Long, Long, Double)]
    val l = prep(left).groupByKey(_._1)
    val r = prep(right).groupByKey(_._1)
    implicit val enc = Encoders.row(outSchema)
    l.cogroup(r) { (k, as, bs) =>
      val av = as.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      val bv = bs.map(t => (t._2, t._3)).toArray.sortBy(_._1)
      dtwPath(av, bv, margin).iterator.zipWithIndex.map {
        case ((ai, bi), step) =>
          Row(k, step + 1, av(ai)._1, bv(bi)._1, av(ai)._2, bv(bi)._2,
            math.abs(av(ai)._2 - bv(bi)._2))
      }
    }
  }
}
