package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BasketOps

/** The per-basket pair-generation cap: identical results where the
  * cap is inactive (every TPC-H basket), bounded task fan-out + exact
  * accounting where it bites (one adversarially huge basket). */
class BasketCapSpec extends AnyFunSuite {
  import TestSession._

  test("cap inactive on TPC-H baskets: pairs equal the uncapped set") {
    val t = Tables(spark, sfDir)
    val baskets = t.lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
    // no basket anywhere near the cap
    assert(baskets.agg(max(size(col("items")))).head.getInt(0) <
      BasketOps.DefaultItemCap)
    val capped = BasketOps.pairs(baskets, "items")
      .groupBy("a", "b").count()
    val uncapped = baskets
      .select(explode(BasketOps.pairColumn("items")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").count()
    assert(capped.except(uncapped).isEmpty &&
      uncapped.except(capped).isEmpty)
  }

  test("random baskets: capped pairs are a subset with exact accounting") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 4) {
      val cap = 4 + rnd.nextInt(12)
      val baskets = Seq.tabulate(40) { i =>
        val n = 1 + rnd.nextInt(2 * cap) // straddle the cap
        (i.toLong, (1 to n).map(_ => rnd.nextInt(50)).distinct.sorted)
      }.toDF("ok", "items")
      val capped = BasketOps.pairs(baskets, "items", cap)
        .groupBy("a", "b").count()
      val uncapped = baskets
        .select(explode(BasketOps.pairColumn("items")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").count()
      // capped multiset never exceeds the uncapped one anywhere
      val over = capped.alias("c")
        .join(uncapped.alias("u"), Seq("a", "b"), "left")
        .where(col("u.count").isNull || col("c.count") > col("u.count"))
      assert(over.isEmpty, s"cap=$cap emitted pairs beyond the true set")
      // per-basket: exactly min(n, cap) choose 2 pairs + exact drops
      val acc = BasketOps.withCappedItems(baskets, "items", cap)
        .select(col("ok"), size(col("items")).as("n"),
          size(col("capped")).as("nc"), col("n_dropped"))
        .collect()
      acc.foreach { r =>
        val n = r.getAs[Int]("n"); val nc = r.getAs[Int]("nc")
        assert(nc == math.min(n, cap))
        assert(r.getAs[Int]("n_dropped") == math.max(n - cap, 0))
      }
      val perBasket = BasketOps
        .withCappedItems(baskets, "items", cap)
        .select(col("ok"), explode(BasketOps.pairColumn("capped")).as("p"))
        .groupBy("ok").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      acc.foreach { r =>
        val nc = r.getAs[Int]("nc").toLong
        val want = nc * (nc - 1) / 2
        assert(perBasket.getOrElse(r.getLong(0), 0L) == want)
      }
    }
  }

  test("one adversarially huge basket: fan-out bounded, drop accounted") {
    val cap = 16
    val huge = spark.range(1)
      .select(lit(1L).as("ok"),
        sequence(lit(1), lit(10000)).as("items")) // 10k-item basket
      .union(spark.range(1)
        .select(lit(2L).as("ok"), sequence(lit(1), lit(5)).as("items")))
    val pairs = BasketOps.pairs(huge, "items", cap)
    // the huge basket emits exactly cap*(cap-1)/2 pairs, never 5e7
    assert(pairs.count() == cap * (cap - 1) / 2 + 5 * 4 / 2)
    // pairs only among the first `cap` items of the sorted array
    assert(pairs.agg(max(col("b"))).head.getInt(0) <= cap)
    // accounting: dropped counts are exact, 0 where the cap is inactive
    val acc = BasketOps.withCappedItems(huge, "items", cap)
      .select(col("ok"), col("n_dropped")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(acc(1L) == 10000 - cap)
    assert(acc(2L) == 0)
  }

  test("triple generation: complete below the cap, bounded above it") {
    val cap = 8
    val basket = spark.range(1)
      .select(lit(1L).as("ok"), sequence(lit(1), lit(5)).as("items"))
    val trips = BasketOps.withCappedItems(basket, "items", cap)
      .select(explode(BasketOps.tripleColumn("capped")).as("t"))
      .select(col("t.a"), col("t.b"), col("t.c")).collect()
    // C(5,3) = 10 strictly-increasing triples, none repeated
    assert(trips.length == 10)
    assert(trips.forall(r =>
      r.getInt(0) < r.getInt(1) && r.getInt(1) < r.getInt(2)))
    assert(trips.distinct.length == 10)
    // a 10k-item basket emits exactly C(cap,3), never 1.7e11
    val huge = spark.range(1)
      .select(lit(1L).as("ok"), sequence(lit(1), lit(10000)).as("items"))
    val n = BasketOps.withCappedItems(huge, "items", cap)
      .select(explode(BasketOps.tripleColumn("capped")).as("t"))
      .count()
    assert(n == cap * (cap - 1) * (cap - 2) / 6)
  }
}
