package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alternating least squares matrix factorization, rank 2, with
  * FIXED-POINT factors so every cross-engine-sensitive reduction is an
  * exact integer sum.
  *
  * The classical distributed ALS shape (Zhou et al., "Large-scale
  * Parallel Collaborative Filtering for the Netflix Prize", 2008 —
  * public algorithm; Spark MLlib implements the same alternation):
  * each half-step joins the ratings to the fixed side's factor table
  * and solves an independent 2x2 normal-equation system per entity.
  * Per half-step that is ONE equi-join + ONE hash aggregate over the
  * ratings — no all-pairs work anywhere, and at 100 TB the join keys
  * (user id / item id) are exactly the natural partitioning of the
  * ratings fact, so the shuffles are the minimum any ALS does.
  *
  * Determinism discipline (the repo's exact-integer rule): factors are
  * BIGINT micro-units (1e6). The normal-equation sums
  * a11 = sum(y1*y1), a12, a22, b1 = sum(r*y1), b2 are then exact
  * integer aggregates (order-independent), each cast to double ONCE
  * (all magnitudes < 2^53, so the cast is exact), the 2x2 solve is a
  * fixed expression tree of IEEE ops (bit-identical in any engine),
  * and the solution is re-quantized via floor(x*1e6 + 0.5) — so a
  * DuckDB oracle running the same CTEs reproduces every factor
  * bit-for-bit. Regularization lambda = 0.1 enters as 1e11 micro^2.
  */
object AlsOps {

  /** lambda * 1e12, the micro^2 fixed-point scale of the Gram sums. */
  val LambdaMicro2: Long = 100000000000L

  /** Deterministic item-factor init: y1 = 1.0, y2 = a Knuth-hash
    * spread over [-0.5, 0.5], both in micro-units. */
  def initFactors(ids: DataFrame, idCol: String): DataFrame =
    ids.select(col(idCol),
      lit(1000000L).as("f1"),
      (col(idCol).cast("long") * lit(2654435761L) % lit(1000001L)
        - lit(500000L)).as("f2"))

  /** One ALS half-step: solve `solveCol`'s factors from `fixedCol`'s.
    *
    * `ratings` has (solveCol, fixedCol, r); `fixed` has
    * (fixedCol, f1, f2) in micro-units. Returns (solveCol, n_obs, f1,
    * f2) in micro-units. The join is plain equi (broadcast-eligible
    * when the fixed side is small; hash otherwise) and the aggregate
    * is map-side combinable.
    */
  def halfStep(ratings: DataFrame, fixed: DataFrame,
      solveCol: String, fixedCol: String): DataFrame = {
    val g = ratings.join(fixed, fixedCol)
      .groupBy(col(solveCol))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("f1") * col("f1")).as("a11"),
        sum(col("f1") * col("f2")).as("a12"),
        sum(col("f2") * col("f2")).as("a22"),
        sum(col("r") * col("f1")).as("b1"),
        sum(col("r") * col("f2")).as("b2"))
    // true-scale doubles: ONE exact cast per integer sum, then a fixed
    // IEEE expression tree (2x2 Cramer solve) — deterministic
    val a11d = (col("a11") + lit(LambdaMicro2)).cast("double") / lit(1e12)
    val a12d = col("a12").cast("double") / lit(1e12)
    val a22d = (col("a22") + lit(LambdaMicro2)).cast("double") / lit(1e12)
    val b1d = col("b1").cast("double") / lit(1e6)
    val b2d = col("b2").cast("double") / lit(1e6)
    val det = a11d * a22d - a12d * a12d
    val x1 = (b1d * a22d - b2d * a12d) / det
    val x2 = (b2d * a11d - b1d * a12d) / det
    g.select(col(solveCol), col("n_obs"),
      floor(x1 * lit(1e6) + lit(0.5)).cast("long").as("f1"),
      floor(x2 * lit(1e6) + lit(0.5)).cast("long").as("f2"))
  }

  /** Full rank-2 ALS: `iters` alternations over (user, item, r),
    * returning (user factors, the item factors they were solved
    * from) — a consistent pair for dot-product scoring. */
  def alsBoth(ratings: DataFrame, userCol: String, itemCol: String,
      iters: Int): (DataFrame, DataFrame) = {
    // NOT cached, deliberately (measured this round): each factor
    // table is consumed exactly once by the next half-step, so the
    // alternation chain has no redundant subtree; only the ratings
    // fact is re-aggregated per half-step. Persisting it (or the
    // factor tables) measured 1.3s -> 4.0s at sf0.1 — the memory-
    // store serialization plus the per-cache materialization barrier
    // cost more than the re-aggregation, and the barriers also stop
    // Catalyst collapsing the half-step subtrees. A 100 TB deployment
    // would persist the ratings aggregate once (one fact pass); that
    // is the caller's call via its own persist, not this operator's.
    var itemF = initFactors(ratings.select(col(itemCol)).distinct(), itemCol)
    var userF: DataFrame = null
    for (k <- 1 to iters) {
      userF = halfStep(ratings, itemF, userCol, itemCol)
      if (k < iters)
        itemF = halfStep(ratings, userF.drop("n_obs"), itemCol, userCol)
          .drop("n_obs")
    }
    (userF, itemF)
  }

  /** Final user-side factors only (the q275 surface). */
  def als(ratings: DataFrame, userCol: String, itemCol: String,
      iters: Int): DataFrame =
    alsBoth(ratings, userCol, itemCol, iters)._1
}
