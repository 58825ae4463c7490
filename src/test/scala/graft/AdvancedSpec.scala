package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** Semantic checks for the round-2 surface (rollup/cube, percentiles,
  * MATCH label aggregates, hash sampling) plus regressions for the
  * short-document shingle guard and graft_cosine type checking. */
class AdvancedSpec extends AnyFunSuite {
  import TestSession._

  test("rollup grand total row equals full row count") {
    val df = SparkEntry.queries("q71_rollup")(spark, sfDir)
    val total = df.where(col("g_year") === 1 && col("g_prio") === 1)
      .select(col("n")).collect()
    assert(total.length == 1)
    val orders = Tables(spark, sfDir).orders.count()
    assert(total.head.getLong(0) == orders)
    // per-year subtotals sum to grand total
    val perYear = df.where(col("g_year") === 0 && col("g_prio") === 1)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(perYear == orders)
  }

  test("cube contains all four grouping shapes") {
    val df = SparkEntry.queries("q72_cube")(spark, sfDir)
    val shapes = df.select(col("g_status"), col("g_prio")).distinct().count()
    assert(shapes == 4)
  }

  test("percentiles are monotone and med == p50") {
    val rows = SparkEntry.queries("q74_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val Seq(p25, p50, p75, p90, med) =
        Seq(1, 2, 3, 4, 5).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
      assert(med == p50)
    }
  }

  test("match label aggregates are internally consistent") {
    val rows = SparkEntry.queries("q75_match_label_aggs")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nRows = r.getAs[Int]("n_rows")
      val nClick = r.getAs[Int]("n_click")
      val nView = r.getAs[Int]("n_view")
      val nPurchase = r.getAs[Int]("n_purchase")
      assert(nClick == 1 && nPurchase == 1)
      assert(nRows == nClick + nView + nPurchase)
      val path = r.getAs[String]("path")
      assert(path.startsWith("click") && path.endsWith("purchase"))
    }
  }

  test("match label-agg match count equals plain match count (q62)") {
    val withAggs = SparkEntry.queries("q75_match_label_aggs")(spark, sfDir)
      .count()
    val plain = SparkEntry.queries("q62_seq_match_regex")(spark, sfDir)
      .agg(sum(col("n_matches"))).collect().head.getLong(0)
    assert(withAggs == plain)
  }

  test("hash sample is deterministic and bucketed") {
    val a = SparkEntry.queries("q79_hash_sample")(spark, sfDir).collect()
    val b = SparkEntry.queries("q79_hash_sample")(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getAs[Long]("bucket") == 0L))
  }

  test("shingles on docs shorter than k yield empty arrays, not errors") {
    import spark.implicits._
    val df = Seq("one", "one two", "one two three").toDF("text")
      .select(TF.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil)
    assert(got(1) == Nil)
    assert(got(2) == List("one two three"))
  }

  test("graft_cosine rejects non-float arrays at analysis time") {
    import spark.implicits._
    graft.plans.VectorExpressions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    intercept[AnalysisException] {
      df.select(expr("graft_cosine(a, b)")).collect()
    }
  }

  test("random generators: range, moments, seed determinism") {
    val df = graft.queries.Advanced.randomStream(Tables(spark, sfDir))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val u = rows.map(_.getAs[Double]("f_uniform"))
    assert(u.forall(v => v >= 0.0 && v < 1.0))
    assert(math.abs(u.sum / u.length - 0.5) < 0.05)
    val g = rows.map(_.getAs[Double]("f_gaussian"))
    assert(math.abs(g.sum / g.length) < 0.1)
    val i = rows.map(_.getAs[Int]("f_int_uniform"))
    assert(i.forall(v => v >= 0 && v < 100))
    // fixed seed + fixed layout => identical stream on re-run
    val again = graft.queries.Advanced.randomStream(Tables(spark, sfDir))
      .collect()
    assert(rows.map(_.toSeq).sameElements(again.map(_.toSeq)))
    // and the q92 contract the driver hash-checks: all verdicts true
    val verdicts = SparkEntry.queries("q92_random_gen")(spark, sfDir)
      .collect()
    assert(verdicts.length == 4)
    for (r <- verdicts; c <- Seq("uniform_in_range", "uniform_mean_ok",
        "gaussian_mean_ok", "int_in_range", "noise_std_ok"))
      assert(r.getAs[Boolean](c), s"verdict $c false in bucket ${r.get(0)}")
  }

  test("approximate aggregates land within tolerance of exact") {
    // the query's own verdict columns must all hold (this is what the
    // driver hash-checks against literal TRUE in the oracle)
    val rows = SparkEntry.queries("q94_approx_stats")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getString(0)
      assert(r.getAs[Boolean]("acd_within_2pct"), s"HLL off >2% for $p")
      assert(r.getAs[Boolean]("ap50_within_5pct"), s"p50 off >5% for $p")
      assert(r.getAs[Boolean]("ap95_within_5pct"), s"p95 off >5% for $p")
    }
    // and the RAW sketch estimates (not just verdicts) stay pinned
    // against independently computed exact values
    val approx = Tables(spark, sfDir).orders
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.01).as("acd"),
        expr("approx_percentile(o_totalprice, 0.5)").as("ap50"),
        expr("approx_percentile(o_totalprice, 0.95)").as("ap95"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables(spark, sfDir).orders
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("cd"),
        expr("percentile(o_totalprice, 0.5D)").as("p50"),
        expr("percentile(o_totalprice, 0.95D)").as("p95"))
      .collect()
    for (e <- exact) {
      val a = approx(e.getString(0))
      def rel(x: Double, y: Double) = math.abs(x - y) / math.max(1.0, y)
      assert(rel(a.getLong(1).toDouble, e.getLong(1).toDouble) < 0.05,
        s"HLL count-distinct off >5% for ${e.getString(0)}")
      assert(rel(a.getDouble(2), e.getDouble(2)) < 0.02, "p50 off >2%")
      assert(rel(a.getDouble(3), e.getDouble(3)) < 0.02, "p95 off >2%")
    }
  }

  test("native shingle hashes equal the composed fingerprint version") {
    import spark.implicits._
    graft.plans.TextExpressions.register(spark)
    for (k <- Seq(2, 3)) {
      val docs = Tables(spark, sfDir).documents
        .select(col("doc_id"), col("text"))
      val composed = docs.select(col("doc_id"), expr(
        s"transform(${TF.shinglesSql("text", k)}, s -> graft_fingerprint(s))")
        .as("h"))
      val native = docs.select(col("doc_id"),
        expr(s"graft_shingle_hashes(text, $k)").as("h"))
      assert(native.exceptAll(composed).isEmpty &&
        composed.exceptAll(native).isEmpty, s"k=$k mismatch")
    }
    // short-text edge: fewer tokens than k -> empty array, no crash
    val short = Seq("one", "", "a b").toDF("text")
      .select(expr("graft_shingle_hashes(text, 3)").as("h"))
      .collect().map(_.getSeq[Long](0).length)
    assert(short(0) == 0 && short(1) == 0 && short(2) == 0)
  }

  test("pg_attribute lists every registered table") {
    val rels = SparkEntry.queries("q80_pg_attribute")(spark, sfDir)
      .select(col("relname")).distinct().collect().map(_.getString(0)).toSet
    assert(rels == Tables.names.toSet)
  }
}
