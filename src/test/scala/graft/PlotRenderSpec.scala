package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PlotOps

/** Server-side PLOT rendering: deterministic SVG over the bounded
  * binned frame, through both the API and the GRAFT RENDER clause. */
class PlotRenderSpec extends AnyFunSuite {
  import TestSession._

  test("renderSvg emits one rect per (series, bin), tallest = yMax") {
    val t = Tables(spark, sfDir)
    val binned = PlotOps.binSeries(
      t.lineitem, "l_extendedprice", 10, "COUNT", "l_orderkey",
      Some("l_returnflag"))
    val nRows = binned.count()
    val svg = PlotOps.renderSvg(binned, "price histogram")
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    assert("<rect ".r.findAllIn(svg).length == nRows)
    // three series -> three legend entries with distinct fills
    assert("<text [^>]*fill=\"#".r.findAllIn(svg).length == 3)
    // deterministic: same input, same markup
    assert(svg == PlotOps.renderSvg(binned, "price histogram"))
  }

  test("GRAFT PLOT ... RENDER returns one svg row") {
    Tables(spark, sfDir).registerAll()
    val rows = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 8 Y AVG l_quantity " +
        "RENDER 'avg qty by price'").collect()
    assert(rows.length == 1)
    val svg = rows.head.getAs[String]("svg")
    assert(svg.contains("avg qty by price"))
    assert("<rect ".r.findAllIn(svg).length == 8)
    // un-rendered form still returns the data frame
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 8 Y AVG l_quantity")
    assert(data.columns.toSeq ==
      Seq("bin", "bin_lo", "bin_hi", "y") && data.count() == 8)
  }

  test("LAYER plans both aggregates over one shared binning") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 8 " +
        "Y COUNT l_quantity LAYER AVG l_quantity")
    assert(data.columns.toSeq ==
      Seq("bin", "bin_lo", "bin_hi", "layer", "y"))
    assert(data.count() == 16) // 2 layers x 8 bins
    // the layers must NOT union two aggregation pipelines: besides
    // the broadcast min/max pass, ONE data scan + ONE hash aggregate
    // feeds the stack() unpivot
    val p = data.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(1500))
    assert(!p.contains("Union"), "layered plot planned as a union")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "layers re-shuffled instead of sharing one aggregate")
  }

  test("FACET panels share the GLOBAL bin grid") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT orders X o_totalprice BINS 6 " +
        "Y COUNT o_totalprice FACET o_orderstatus").collect()
    // same bin -> same bin_lo across every facet (shared x scale)
    val byBin = data.groupBy(_.getAs[Int]("bin"))
    for ((_, rows) <- byBin)
      assert(rows.map(_.getAs[Double]("bin_lo")).distinct.size == 1,
        "facets disagree on the bin grid")
  }

  test("X FROM/TO domain: filter pushed, no min/max pass, fixed grid") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice FROM 1000 TO 50000 " +
        "BINS 8 Y COUNT l_quantity")
    val p = data.queryExecution.executedPlan.toString
    // explicit domain -> the observed-min/max pass disappears
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"domain spec still plans a min/max scan:\n${p.take(1200)}")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_extendedprice,1000.0)"),
      "domain filter did not reach the scan")
    // fixed grid: bin 0 starts exactly at the declared lower bound
    val first = data
      .orderBy(org.apache.spark.sql.functions.col("bin"))
      .collect().head
    assert(first.getAs[Double]("bin_lo") == 1000.0)
  }

  test("SCALE LOG changes the rendered geometry, deterministically") {
    Tables(spark, sfDir).registerAll()
    def render(scale: String): String = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 6 " +
        s"Y COUNT l_quantity$scale RENDER 'counts'")
      .collect().head.getAs[String]("svg")
    val linear = render("")
    val logy = render(" SCALE LOG")
    assert(linear != logy, "SCALE LOG made no difference")
    assert("<rect ".r.findAllIn(logy).length == 6)
    assert(logy == render(" SCALE LOG"), "log render not deterministic")
  }

  test("layered + faceted RENDER: bars, polylines, one panel per facet") {
    Tables(spark, sfDir).registerAll()
    val rows = spark.sql(
      "GRAFT PLOT orders X o_totalprice BINS 5 " +
        "Y COUNT o_totalprice LAYER AVG o_totalprice " +
        "FACET o_orderstatus RENDER 'price by status'").collect()
    assert(rows.length == 1)
    val svg = rows.head.getAs[String]("svg")
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    // 3 order statuses -> 3 panels: bars for the first layer
    // (3 facets x 5 bins) and one polyline per (facet, extra layer)
    assert("<rect ".r.findAllIn(svg).length == 15)
    assert("<polyline ".r.findAllIn(svg).length == 3)
    // deterministic markup
    val again = spark.sql(
      "GRAFT PLOT orders X o_totalprice BINS 5 " +
        "Y COUNT o_totalprice LAYER AVG o_totalprice " +
        "FACET o_orderstatus RENDER 'price by status'")
      .collect().head.getAs[String]("svg")
    assert(svg == again)
  }
}
