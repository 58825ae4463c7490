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
}
