package graft

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 optimization pins: the ArrayCombos codegen/unsafe rewrite
  * must stay row-identical to the r11 interpreted form, resolve on any
  * session built through Engine (no withCappedItems ordering trap),
  * and fail loudly instead of overflowing.
  */
class R12OptimSpec extends AnyFunSuite {
  import TestSession._

  test("graft_pairs/graft_triples resolve on a fresh session " +
      "(registered at session build, not via withCappedItems)") {
    // newSession() drops temp functions but keeps extension-injected
    // ones — exactly the surface a caller using BasketOps.pairColumn
    // without withCappedItems sees
    val fresh = spark.newSession()
    val p = fresh.sql(
      "SELECT explode(graft_pairs(array(1, 2, 3))) AS e")
      .select(col("e.a"), col("e.b")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(p === Set((1, 2), (1, 3), (2, 3)))
    val t = fresh.sql(
      "SELECT explode(graft_triples(array(1, 2, 3, 4))) AS e")
      .select(col("e.a"), col("e.b"), col("e.c")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(t === Set((1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)))
  }

  test("unsafe long fast path == generic path (pairs and triples)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = Seq.tabulate(80) { i =>
      (i.toLong, (0 until rnd.nextInt(10))
        .map(_ => rnd.nextInt(50).toLong).distinct.sorted)
    }
    val df = rows.toDF("id", "items") // array<bigint>, containsNull=false
    val fast = df.select(col("id"),
        explode(expr("graft_pairs(items)")).as("e"))
      .select(col("id"), col("e.a"), col("e.b"))
    // force the generic path through the same expression by routing
    // the elements through strings (containsNull=false but non-numeric)
    val gen = df.select(col("id"), explode(expr(
        "graft_pairs(transform(items, x -> cast(x AS string)))")).as("e"))
      .select(col("id"), col("e.a").cast("long").as("a"),
        col("e.b").cast("long").as("b"))
    assert(fast.except(gen).isEmpty && gen.except(fast).isEmpty)
    assert(fast.count() === gen.count())
    val fastT = df.select(col("id"),
        explode(expr("graft_triples(items)")).as("e"))
      .select(col("id"), col("e.a"), col("e.b"), col("e.c"))
    val genT = df.select(col("id"), explode(expr(
        "graft_triples(transform(items, x -> cast(x AS string)))"))
        .as("e"))
      .select(col("id"), col("e.a").cast("long").as("a"),
        col("e.b").cast("long").as("b"), col("e.c").cast("long").as("c"))
    assert(fastT.except(genT).isEmpty && genT.except(fastT).isEmpty)
    assert(fastT.count() === genT.count())
  }

  test("combination-count overflow fails loudly before allocation") {
    val big = UnsafeArrayData.fromPrimitiveArray(
      Array.tabulate(70000)(_.toLong))
    val e = intercept[IllegalArgumentException] {
      graft.plans.ArrayCombos.pairsLong(big)
    }
    assert(e.getMessage.contains("graft_pairs"))
    val bigT = UnsafeArrayData.fromPrimitiveArray(
      Array.tabulate(3000)(_.toLong))
    val eT = intercept[IllegalArgumentException] {
      graft.plans.ArrayCombos.triplesLong(bigT)
    }
    assert(eT.getMessage.contains("graft_triples"))
  }

  test("non-array argument is an analysis error, not a runtime cast") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_pairs(42)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
