package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-generated testdata contract. The driver regenerates
  * /root/testdata between rounds and has changed physical layouts
  * before (round 4: events.ts flipped TIMESTAMP(NANOS) →
  * timestamp[us] and broke 73 queries at analysis). This spec makes
  * any schema drift fail ONE named test with a readable diff instead
  * of scattering analysis errors across the registry.
  *
  * Column NAMES must match exactly. Types are asserted through the
  * NORMALIZED Tables accessors (which are allowed to adapt physical
  * layouts), so a physical flip that the catalog absorbs correctly
  * still passes — only an unabsorbed drift fails.
  */
class TestdataContractSpec extends AnyFunSuite {
  import TestSession._

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private def normalize(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalize(e))
    case other => other
  }

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table schema matches the pinned contract") {
      val t = Tables(spark, sfDir)
      val df = table match {
        case "events" => t.events
        case other => t.table(other)
      }
      val actual = df.schema.fields.toSeq
        .map(f => f.name -> normalize(f.dataType))
      assert(actual == cols.map { case (n, d) => n -> normalize(d) },
        s"\ntestdata contract drift for '$table' —\n" +
          s"  expected: $cols\n  actual:   $actual\n" +
          "If the driver changed the physical layout, teach the Tables\n" +
          "accessor to absorb it (see Tables.normalizeEventsTs), then\n" +
          "update this contract.")
    }
  }

  test("TPC-H fact tables expose the columns the registry uses") {
    val t = Tables(spark, sfDir)
    val need = Map(
      "customer" -> Set("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey"),
      "part" -> Set("p_partkey", "p_name", "p_brand", "p_type"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderdate",
        "o_totalprice", "o_orderpriority", "o_orderstatus"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    for ((tab, cols) <- need.toSeq.sortBy(_._1)) {
      val have = t.table(tab).columns.toSet
      assert(cols.subsetOf(have),
        s"$tab is missing ${cols -- have} (have: $have)")
    }
  }
}
