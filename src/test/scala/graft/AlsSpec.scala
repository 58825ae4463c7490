package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank-2 fixed-point ALS (operators.AlsOps / q275). Value-level
  * cross-engine equality goes through the DuckDB gate (the unrolled-CTE
  * oracle); these pin the optimization property the gate can't see:
  * each alternation is a least-squares solve, so the regularized SSE
  * must be non-increasing across iterations. */
class AlsSpec extends AnyFunSuite {
  import TestSession._

  private def ratings = {
    val t = Tables(spark, sfDir)
    t.lineitem
      .groupBy(col("l_suppkey").as("u"), col("l_partkey").as("i"))
      .agg(count(lit(1)).as("r"))
  }

  /** SSE of observed ratings under (user, item) micro-unit factors. */
  private def sse(userF: org.apache.spark.sql.DataFrame,
      itemF: org.apache.spark.sql.DataFrame): Double = {
    val u = userF.select(col("u"), col("f1").as("uf1"), col("f2").as("uf2"))
    val it = itemF.select(col("i"), col("f1").as("if1"), col("f2").as("if2"))
    ratings.join(u, "u").join(it, "i")
      .select(pow(col("r").cast("double")
        - (col("uf1") * col("if1") + col("uf2") * col("if2"))
          .cast("double") / lit(1e12), 2).as("e"))
      .agg(sum(col("e"))).head().getDouble(0)
  }

  test("als: alternation decreases the reconstruction SSE") {
    import graft.operators.AlsOps
    val r = ratings
    val y0 = AlsOps.initFactors(r.select(col("i")).distinct(), "i")
    val u1 = AlsOps.halfStep(r, y0, "u", "i").drop("n_obs")
    val y1 = AlsOps.halfStep(r, u1, "i", "u").drop("n_obs")
    val u2 = AlsOps.halfStep(r, y1, "u", "i").drop("n_obs")
    val s1 = sse(u1, y0)
    val s2 = sse(u1, y1)
    val s3 = sse(u2, y1)
    // each half-step optimizes its side exactly (up to the 1e-6
    // quantization), so SSE is monotone along the alternation
    assert(s2 <= s1 * (1 + 1e-6), s"item step raised SSE: $s1 -> $s2")
    assert(s3 <= s2 * (1 + 1e-6), s"user step raised SSE: $s2 -> $s3")
  }

  test("recommender statement == alsBoth + integer dot-product top-k") {
    import graft.operators.AlsOps
    val t = Tables(spark, sfDir)
    t.registerAll()
    spark.sql("SELECT l_suppkey AS u, l_partkey AS i FROM lineitem")
      .createOrReplaceTempView("rec_spec_ev")
    spark.sql(
      "GRAFT CREATE RECOMMENDER recspec USER u ITEM i ITERS 2 " +
        "ON rec_spec_ev")
    val viaSql = spark.sql("GRAFT RECOMMEND recspec USER 1 K 3").collect()
    val (userF, itemF) = AlsOps.alsBoth(ratings, "u", "i", 2)
    val u1 = userF.where(col("u") === 1L).head()
    val (uf1, uf2) = (u1.getAs[Long]("f1"), u1.getAs[Long]("f2"))
    val expected = itemF.collect()
      .map(r => (r.getAs[Long]("i"),
        uf1 * r.getAs[Long]("f1") + uf2 * r.getAs[Long]("f2")))
      .sortBy { case (i, s) => (-s, i) }.take(3)
    assert(viaSql.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == expected.toSeq)
    spark.sql("GRAFT DROP RECOMMENDER recspec")
    assert(!spark.catalog.tableExists("graft_model_recspec"))
  }

  test("q275: one row per supplier, n_obs = distinct parts supplied") {
    val out = queries.Analytics.queries("q275_als")(spark, sfDir)
    val expected = ratings.groupBy(col("u"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect()
    assert(rows.length == expected.size)
    for (row <- rows) {
      val k = row.getAs[Long]("suppkey")
      assert(row.getAs[Long]("n_obs") == expected(k))
      // factors are finite and in a sane range (micro-units)
      assert(math.abs(row.getAs[Long]("f1_micro")) < 100000000L)
      assert(math.abs(row.getAs[Long]("f2_micro")) < 100000000L)
    }
  }
}
