package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranked-retrieval operators (queries.Pipeline q219/q220).
  * Value-level equivalence goes through the DuckDB gate; these pin
  * the ranking invariants the gate can't see. */
class RetrievalSpec extends AnyFunSuite {
  import TestSession._

  test("query likelihood: 10 ranks, scores non-increasing, all negative") {
    val r = queries.Pipeline.queries("q317_query_likelihood")(spark, sfDir)
      .collect()
    assert(r.length == 10)
    val byRank = r.sortBy(_.getAs[Int]("rk"))
    assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to 10))
    val scores = byRank.map(_.getAs[Double]("score"))
    // log-probabilities: strictly negative, sorted descending
    assert(scores.forall(_ < 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every retrieved doc must contain at least one query term
    val ids = byRank.map(_.getAs[Long]("doc_id")).toSet
    val t = Tables(spark, sfDir)
    val withTerm = t.documents
      .where(col("doc_id").isin(ids.toSeq: _*))
      .where(lower(col("text")).rlike("\\b(hash|merge|scan)\\b"))
      .count()
    assert(withTerm == ids.size.toLong)
  }

  test("GRAFT SEARCH METHOD QL equals the query-likelihood operator") {
    val t = Tables(spark, sfDir)
    t.registerAll()
    val viaSql = spark.sql(
      "GRAFT SEARCH documents ID doc_id TEXT text " +
        "FOR 'hash merge scan' TOP 10 METHOD QL").collect().toSeq
    val viaOp = operators.TextSearchOps.queryLikelihood(
      t.documents, "doc_id", "text",
      Seq("hash", "merge", "scan"), 10).collect().toSeq
    assert(viaSql == viaOp && viaSql.nonEmpty)
    // default method stays BM25
    val viaDefault = spark.sql(
      "GRAFT SEARCH documents ID doc_id TEXT text " +
        "FOR 'hash merge scan' TOP 10").collect().toSeq
    val viaBm = operators.TextSearchOps.bm25(
      t.documents, "doc_id", "text",
      Seq("hash", "merge", "scan"), 10).collect().toSeq
    assert(viaDefault == viaBm)
  }

  test("bm25: 10 ranks, scores positive and non-increasing in rank") {
    val r = queries.Pipeline.queries("q219_bm25")(spark, sfDir).collect()
    assert(r.length == 10)
    val byRank = r.sortBy(_.getAs[Int]("rk"))
    assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to 10))
    val scores = byRank.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0), s"non-positive BM25 score: ${scores.toSeq}")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"scores not non-increasing: ${scores.toSeq}")
  }

  test("bm25: every top doc actually contains a query term") {
    val top = queries.Pipeline.queries("q219_bm25")(spark, sfDir)
      .select(col("doc_id"))
    val t = Tables(spark, sfDir)
    val without = top.join(
      t.documents.where(col("text").rlike("hash|merge|scan"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(without.count() == 0, "a top-10 doc has no query term")
  }

  test("GRAFT SEARCH statement equals the direct bm25 operator call") {
    Tables(spark, sfDir).registerAll()
    val viaSql = spark.sql(
      "GRAFT SEARCH documents ID doc_id TEXT text FOR 'hash merge scan' TOP 10")
    val direct = queries.Pipeline.queries("q219_bm25")(spark, sfDir)
    assert(viaSql.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaSql).count() == 0,
      "statement and operator results differ")
  }

  test("materialized index reproduces the direct-scan scores exactly") {
    val direct = queries.Pipeline.queries("q219_bm25")(spark, sfDir)
    val indexed = queries.Pipeline.queries("q222_bm25_indexed")(spark, sfDir)
    assert(indexed.exceptAll(direct).count() == 0 &&
      direct.exceptAll(indexed).count() == 0,
      "indexed and direct bm25 results differ")
  }

  test("GRAFT INDEX + SEARCH INDEX statements equal the direct path") {
    Tables(spark, sfDir).registerAll()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-sql").toString
    val built = spark.sql(
      s"GRAFT INDEX documents ID doc_id TEXT text INTO '$dir'")
      .collect().head
    assert(built.getAs[String]("status") == "built")
    val viaSql = spark.sql(
      s"GRAFT SEARCH INDEX '$dir' ID doc_id FOR 'hash merge scan' TOP 10")
    val direct = queries.Pipeline.queries("q219_bm25")(spark, sfDir)
    assert(viaSql.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaSql).count() == 0,
      "SEARCH INDEX and direct bm25 results differ")
  }

  test("rrf: fused score is exactly the reciprocal-rank formula") {
    val r = queries.Pipeline.queries("q220_hybrid_rrf")(spark, sfDir)
      .collect()
    assert(r.length == 10)
    for (row <- r) {
      val l = Option(row.getAs[Integer]("lex_rk")).map(_.intValue)
      val v = Option(row.getAs[Integer]("vec_rk")).map(_.intValue)
      assert(l.nonEmpty || v.nonEmpty, s"doc in neither list: $row")
      assert(l.forall(x => x >= 1 && x <= 20) &&
        v.forall(x => x >= 1 && x <= 20), s"rank out of [1,20]: $row")
      val exp = l.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        v.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      val got = row.getAs[Double]("rrf")
      assert(math.abs(got - exp) < 1e-6,
        s"rrf $got != formula $exp in $row")
    }
  }

  test("rrf: a doc ranked in both lists beats one ranked in either " +
    "list at an equal-or-worse position") {
    val r = queries.Pipeline.queries("q220_hybrid_rrf")(spark, sfDir)
      .collect()
    val both = r.filter(x => x.getAs[Integer]("lex_rk") != null &&
      x.getAs[Integer]("vec_rk") != null)
    val single = r.filter(x => x.getAs[Integer]("lex_rk") == null ||
      x.getAs[Integer]("vec_rk") == null)
    for (b <- both; s <- single) {
      val bWorst = math.max(b.getAs[Integer]("lex_rk").intValue,
        b.getAs[Integer]("vec_rk").intValue)
      val sBest = Seq(Option(s.getAs[Integer]("lex_rk")),
        Option(s.getAs[Integer]("vec_rk"))).flatten.map(_.intValue).min
      if (bWorst <= sBest)
        assert(b.getAs[Double]("rrf") >= s.getAs[Double]("rrf"),
          s"dual-list doc $b outranked by single-list doc $s")
    }
  }
}
