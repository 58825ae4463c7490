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

  test("GEOM POINT / LINE render marks over the binSeries frame") {
    Tables(spark, sfDir).registerAll()
    def render(geom: String): String = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 6 " +
        s"Y AVG l_quantity SERIES l_returnflag GEOM $geom " +
        "RENDER 'qty by price'").collect().head.getAs[String]("svg")
    val pts = render("POINT")
    // 3 series x 6 bins -> 18 circles, no bars
    assert("<circle ".r.findAllIn(pts).length == 18)
    assert(!pts.contains("<rect "))
    assert(pts == render("POINT"), "point render not deterministic")
    val lines = render("LINE")
    // one polyline per series
    assert("<polyline ".r.findAllIn(lines).length == 3)
    assert(!lines.contains("<circle "))
  }

  test("Y BAND plans the ribbon frame; GEOM RIBBON renders envelope") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 6 " +
        "Y BAND l_quantity SERIES l_returnflag")
    assert(data.columns.toSeq == Seq("series", "bin", "bin_lo",
      "bin_hi", "y_min", "y_avg", "y_max"))
    // envelope invariant: min <= avg <= max on every row
    for (r <- data.collect()) {
      assert(r.getAs[Double]("y_min") <= r.getAs[Double]("y_avg"))
      assert(r.getAs[Double]("y_avg") <= r.getAs[Double]("y_max"))
    }
    val svg = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 6 " +
        "Y BAND l_quantity SERIES l_returnflag RENDER 'qty band'")
      .collect().head.getAs[String]("svg")
    // one filled polygon + one avg polyline per series
    assert("<polygon ".r.findAllIn(svg).length == 3)
    assert("<polyline ".r.findAllIn(svg).length == 3)
  }

  test("Y BOX plans the five-number frame; GEOM BOX renders glyphs") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT orders X o_totalprice BINS 5 " +
        "Y BOX o_totalprice SERIES o_orderstatus")
    assert(data.columns.toSeq == Seq("series", "bin", "bin_lo",
      "bin_hi", "y_min", "q1", "med", "q3", "y_max"))
    // five-number ordering invariant per row
    for (r <- data.collect()) {
      val vs = Seq("y_min", "q1", "med", "q3", "y_max")
        .map(r.getAs[Double])
      assert(vs == vs.sorted, s"unsorted summary: $vs")
    }
    val n = data.count()
    val svg = spark.sql(
      "GRAFT PLOT orders X o_totalprice BINS 5 " +
        "Y BOX o_totalprice SERIES o_orderstatus RENDER 'price box'")
      .collect().head.getAs[String]("svg")
    // one box rect per (series, bin) group present in the frame
    assert("fill-opacity=\"0.5\"".r.findAllIn(svg).length == n)
    // whisker + median tick lines: 2 per glyph + 2 axis lines
    assert("<line ".r.findAllIn(svg).length == 2 * n + 2)
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

  test("SEGMENT geom: one line per row, arrowheads on demand") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_seg AS " +
      "SELECT CAST(n_nationkey AS DOUBLE) AS x0, " +
      "CAST(n_nationkey AS DOUBLE) AS x1, " +
      "CAST(0 AS DOUBLE) AS y0, " +
      "CAST(n_regionkey + 1 AS DOUBLE) AS y1 FROM nation").collect()
    val n = spark.sql(
      "GRAFT PLOT prs_seg SEGMENTS X x0 XEND x1 Y y0 YEND y1")
      .count()
    assert(n == Tables(spark, sfDir).nation.count())
    val svg = spark.sql(
      "GRAFT PLOT prs_seg SEGMENTS X x0 XEND x1 Y y0 YEND y1 " +
        "ARROW RENDER 'spans'").collect().head.getAs[String]("svg")
    // one segment line per nation + the two axis lines
    assert("<line ".r.findAllIn(svg).length == n + 2)
    assert(svg.contains("marker-end=\"url(#ah)\"") &&
      svg.contains("<marker id=\"ah\""))
    // LIMIT bounds the marks frame
    assert(spark.sql("GRAFT PLOT prs_seg SEGMENTS X x0 XEND x1 " +
      "Y y0 YEND y1 LIMIT 5").count() == 5)
    spark.sql("GRAFT DROP VIEW prs_seg").collect()
  }

  test("HEATMAP geom: one tile per populated cell, opacity scaled") {
    Tables(spark, sfDir).registerAll()
    val cells = spark.sql(
      "GRAFT PLOT lineitem HEATMAP X l_quantity BINS 4 " +
        "Y l_extendedprice BINS 3").count()
    assert(cells >= 1 && cells <= 12)
    val svg = spark.sql(
      "GRAFT PLOT lineitem HEATMAP X l_quantity BINS 4 " +
        "Y l_extendedprice BINS 3 RENDER 'qty x price'")
      .collect().head.getAs[String]("svg")
    assert("<rect ".r.findAllIn(svg).length == cells)
    // the densest cell renders fully opaque
    assert(svg.contains("fill-opacity=\"1.00\""))
  }

  test("TICKER geom: wick + body per candle, rising hollow") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_tkr AS " +
      "SELECT CAST(ts AS DATE) AS d, " +
      "CAST(MIN(value) AS DOUBLE) AS o, " +
      "CAST(MAX(value) + 1 AS DOUBLE) AS h, " +
      "CAST(MIN(value) - 1 AS DOUBLE) AS l, " +
      "CAST(MAX(value) AS DOUBLE) AS c " +
      "FROM events GROUP BY CAST(ts AS DATE)").collect()
    val n = spark.sql("GRAFT PLOT prs_tkr TICKER TIME d OPEN o " +
      "HIGH h LOW l CLOSE c LIMIT 10").count()
    assert(n == 10)
    val svg = spark.sql("GRAFT PLOT prs_tkr TICKER TIME d OPEN o " +
      "HIGH h LOW l CLOSE c LIMIT 10 RENDER 'candles'")
      .collect().head.getAs[String]("svg")
    // one wick line per candle + the two axis lines; one body rect
    assert("<line ".r.findAllIn(svg).length == n + 2)
    assert("<rect ".r.findAllIn(svg).length == n)
    // all candles here rise (c = max >= o = min): hollow bodies
    assert("fill=\"none\"".r.findAllIn(svg).length == n)
    spark.sql("GRAFT DROP VIEW prs_tkr").collect()
  }

  test("TEXT geom: one escaped label per row, mid-anchored") {
    Tables(spark, sfDir).registerAll()
    val n = Tables(spark, sfDir).nation.count()
    val svg = spark.sql(
      "GRAFT PLOT nation LABELS n_name X n_nationkey Y n_regionkey " +
        "RENDER 'nations'").collect().head.getAs[String]("svg")
    // one label per nation + the title + the axis-extent label-free
    // frame (title is the only other <text>)
    assert("<text ".r.findAllIn(svg).length == n + 1)
    assert(svg.contains("text-anchor=\"middle\""))
  }

  test("VLINES geom: one dashed line per distinct value, bounded") {
    Tables(spark, sfDir).registerAll()
    val svg = spark.sql(
      "GRAFT PLOT lineitem VLINES X l_quantity LIMIT 5 " +
        "RENDER 'qty marks'").collect().head.getAs[String]("svg")
    // 5 vlines + 2 axis lines
    assert("<line ".r.findAllIn(svg).length == 7)
    assert("stroke-dasharray=\"4 3\"".r.findAllIn(svg).length == 5)
  }

  test("ABLINES geom: one line per (slope, intercept) over FROM/TO") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_ab AS " +
      "SELECT CAST(n_regionkey AS DOUBLE) AS m, 1.0 AS b " +
      "FROM nation GROUP BY n_regionkey").collect()
    val svg = spark.sql(
      "GRAFT PLOT prs_ab ABLINES SLOPE m INTERCEPT b " +
        "FROM 0 TO 10 RENDER 'fits'").collect().head.getAs[String]("svg")
    assert("stroke-dasharray=\"6 3\"".r.findAllIn(svg).length == 5)
    spark.sql("GRAFT DROP VIEW prs_ab").collect()
  }

  test("REGIONS geom: one shaded band per row, X and Y axes") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_rg AS " +
      "SELECT CAST(n_regionkey AS DOUBLE) AS lo, " +
      "CAST(n_regionkey + 1 AS DOUBLE) AS hi " +
      "FROM nation GROUP BY n_regionkey").collect()
    val x = spark.sql("GRAFT PLOT prs_rg REGIONS LO lo HI hi AXIS X " +
      "RENDER 'bands'").collect().head.getAs[String]("svg")
    val y = spark.sql("GRAFT PLOT prs_rg REGIONS LO lo HI hi AXIS Y " +
      "RENDER 'bands'").collect().head.getAs[String]("svg")
    assert("fill-opacity=\"0.15\"".r.findAllIn(x).length == 5)
    assert("fill-opacity=\"0.15\"".r.findAllIn(y).length == 5)
    assert(x != y) // vertical vs horizontal bands
    spark.sql("GRAFT DROP VIEW prs_rg").collect()
  }

  test("POINTRANGE / RANGEX geoms: interval marks per row") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_pr AS " +
      "SELECT CAST(n_regionkey AS DOUBLE) AS x, 5.0 AS y, " +
      "2.0 AS ylo, 8.0 AS yhi FROM nation GROUP BY n_regionkey")
      .collect()
    val pr = spark.sql("GRAFT PLOT prs_pr POINTRANGE X x Y y " +
      "YMIN ylo YMAX yhi RENDER 'pr'").collect().head.getAs[String]("svg")
    // one range line + one point per row, plus 2 axis lines
    assert("<circle ".r.findAllIn(pr).length == 5)
    assert("<line ".r.findAllIn(pr).length == 5 + 2)
    val rx = spark.sql("GRAFT PLOT prs_pr RANGEX Y x XMIN ylo " +
      "XMAX yhi RENDER 'rx'").collect().head.getAs[String]("svg")
    assert("stroke-linecap=\"round\"".r.findAllIn(rx).length == 5)
    spark.sql("GRAFT DROP VIEW prs_pr").collect()
  }

  test("degenerate domain: a constant column bins into bucket 0") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_const AS " +
      "SELECT 42.0 AS x, n_regionkey AS y FROM nation").collect()
    val series = spark.sql(
      "GRAFT PLOT prs_const X x BINS 8 Y COUNT y")
    assert(series.count() == 1 &&
      series.head().getAs[Number]("bin").intValue() == 0)
    val heat = spark.sql(
      "GRAFT PLOT prs_const HEATMAP X x BINS 8 Y y BINS 6")
    // x collapses to bucket 0; y keeps its real spread
    assert(heat.select("bx").distinct().count() == 1)
    assert(heat.select("by").distinct().count() > 1)
    spark.sql("GRAFT DROP VIEW prs_const").collect()
  }

  test("GEOMAP geom: world-grid tiles + graticule, grid is corpus-free") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW prs_geo AS SELECT " +
      "CAST(c_custkey % 360 AS DOUBLE) - 180 + 0.5 AS lon, " +
      "CAST((c_custkey * 7) % 180 AS DOUBLE) - 90 + 0.5 AS lat " +
      "FROM customer").collect()
    val frame = spark.sql(
      "GRAFT PLOT prs_geo GEOMAP LAT lat LON lon BINS 12")
    assert(frame.columns.toSeq == Seq("bx", "by", "lon_lo", "lon_hi",
      "lat_lo", "lat_hi", "n"))
    assert(frame.count() <= 12 * 6) // bounded by the grid, not rows
    val svg = spark.sql(
      "GRAFT PLOT prs_geo GEOMAP LAT lat LON lon BINS 12 " +
        "RENDER 'world'").collect().head.getAs[String]("svg")
    // populated tiles + the 2 graticule lines + 2 axis lines
    assert("<rect ".r.findAllIn(svg).length == frame.count())
    assert("stroke-dasharray=\"2 2\"".r.findAllIn(svg).length == 2)
    // out-of-range coordinates drop instead of clamping to edge tiles
    spark.sql("GRAFT CREATE TEMP VIEW prs_geo_bad AS " +
      "SELECT 500.0 AS lon, 10.0 AS lat").collect()
    assert(spark.sql(
      "GRAFT PLOT prs_geo_bad GEOMAP LAT lat LON lon BINS 12")
      .count() == 0)
    spark.sql("GRAFT DROP VIEW prs_geo").collect()
    spark.sql("GRAFT DROP VIEW prs_geo_bad").collect()
  }

  test("annotation OVERLAY: VLINE/HLINE/REGIONX ride the base plot") {
    Tables(spark, sfDir).registerAll()
    val base = spark.sql(
      "GRAFT PLOT lineitem X l_quantity BINS 8 Y COUNT l_orderkey " +
        "RENDER 'qty'").collect().head.getAs[String]("svg")
    val svg = spark.sql(
      "GRAFT PLOT lineitem X l_quantity BINS 8 Y COUNT l_orderkey " +
        "VLINE 10.5,20.5 HLINE 100 REGIONX 30 40 " +
        "RENDER 'qty'").collect().head.getAs[String]("svg")
    // annotations are appended on top of the identical base markup
    assert(svg.startsWith(base.stripSuffix("</svg>")))
    assert("stroke-dasharray=\"4 3\"".r.findAllIn(svg).length == 3)
    assert("fill-opacity=\"0.15\"".r.findAllIn(svg).length == 1)
    // the region rect spans exactly 1/5 of the [0,50ish] quantity
    // domain width — sanity: its width is positive and < plot width
    val w = "fill-opacity=\"0\\.15\"".r.findFirstMatchIn(svg).get
    assert(w != null)
  }

  test("POSITION STACK: cumulative fold, bars share the group slot") {
    val t = Tables(spark, sfDir)
    val binned = PlotOps.binSeries(
      t.orders, "o_totalprice", 5, "COUNT", "o_orderkey",
      Some("o_orderstatus"))
    val svg = PlotOps.renderSvg(binned, "stacked", position = "stack")
    val dodged = PlotOps.renderSvg(binned, "stacked")
    // same number of rects either way — composition differs
    val rectRe =
      ("""<rect x="([0-9.]+)" y="([0-9.]+)" width="([0-9.]+)" """ +
        """height="([0-9.]+)"""").r
    val stackRects = rectRe.findAllMatchIn(svg).map(m =>
      (m.group(1).toDouble, m.group(2).toDouble,
        m.group(3).toDouble, m.group(4).toDouble)).toSeq
    assert(stackRects.length == binned.count())
    // stacked: within one x slot, every bar has the SAME x and the
    // segments tile exactly — each bar's top (y) equals the next
    // bar's bottom (y + height)
    val byX = stackRects.groupBy(_._1).values.filter(_.length > 1)
    assert(byX.nonEmpty)
    byX.foreach { bars =>
      val sorted = bars.sortBy(-_._2) // bottom-most first
      sorted.sliding(2).foreach {
        case Seq(below, above) =>
          assert(math.abs(below._2 - (above._2 + above._4)) < 0.05,
            s"stack gap: $below vs $above")
        case _ => ()
      }
    }
    // the tallest stacked column spans (nearly) the full plot height
    val plotH = 360 - 28 - 24
    val colHeights = stackRects.groupBy(_._1).values
      .map(_.map(_._4).sum)
    assert(math.abs(colHeights.max - plotH) < 0.1)
    // dodged bars are narrower (three series share the slot)
    val dodgeW = rectRe.findAllMatchIn(dodged)
      .map(_.group(3).toDouble).max
    val stackW = stackRects.map(_._3).max
    assert(stackW > dodgeW * 2)
  }

  test("GRAFT PLOT ... POSITION STACK RENDER + guards") {
    Tables(spark, sfDir).registerAll()
    val rows = spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
      "Y COUNT o_totalprice SERIES o_orderstatus GEOM BAR " +
      "POSITION STACK RENDER 'stacked orders'").collect()
    assert(rows.head.getAs[String]("svg").contains("stacked orders"))
    // STACK composes only with bars
    val e = intercept[Exception] {
      spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
        "Y COUNT o_totalprice SERIES o_orderstatus GEOM LINE " +
        "POSITION STACK RENDER").collect()
    }
    assert(e.getMessage.contains("GEOM BAR only"))
  }

  test("POSITION JITTER: deterministic hash offsets on point marks") {
    Tables(spark, sfDir).registerAll()
    val plain = spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
      "Y COUNT o_totalprice SERIES o_orderstatus GEOM POINT " +
      "RENDER 'pts'").collect().head.getAs[String]("svg")
    val jit = spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
      "Y COUNT o_totalprice SERIES o_orderstatus GEOM POINT " +
      "POSITION JITTER RENDER 'pts'").collect().head.getAs[String]("svg")
    // same mark count, shifted x coordinates, byte-stable across runs
    assert("<circle ".r.findAllIn(plain).length ==
      "<circle ".r.findAllIn(jit).length)
    assert(plain != jit)
    val jit2 = spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
      "Y COUNT o_totalprice SERIES o_orderstatus GEOM POINT " +
      "POSITION JITTER RENDER 'pts'").collect().head.getAs[String]("svg")
    assert(jit == jit2)
    // JITTER rejects non-point geoms
    val e = intercept[Exception] {
      spark.sql("GRAFT PLOT orders X o_totalprice BINS 6 " +
        "Y COUNT o_totalprice SERIES o_orderstatus GEOM BAR " +
        "POSITION JITTER RENDER").collect()
    }
    assert(e.getMessage.contains("JITTER"))
  }

  test("SMOOTH LOESS: bounded frame + dashed overlay render") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 12 " +
        "Y AVG l_discount SERIES l_returnflag " +
        "SMOOTH LOESS BANDWIDTH 0.5")
    assert(data.columns.toSeq ==
      Seq("series", "bin", "bin_lo", "bin_hi", "y", "smooth"))
    val rows = data.collect()
    assert(rows.length <= 3 * 12 && rows.nonEmpty)
    // the smoother tracks the data: every fitted value stays inside
    // the series' own y envelope (tri-cube weights are a convex-ish
    // local average; a wild extrapolation means a broken fit)
    val bySeries = rows.groupBy(_.getAs[String]("series"))
    bySeries.foreach { case (_, rs) =>
      val ys = rs.map(_.getAs[Double]("y"))
      val pad = (ys.max - ys.min) * 0.5 + 1e-9
      rs.foreach { r =>
        val sm = r.getAs[Double]("smooth")
        assert(sm >= ys.min - pad && sm <= ys.max + pad,
          s"loess fit $sm far outside y range [${ys.min}, ${ys.max}]")
      }
    }
    // n < 2 points: smooth == y (no fit possible)
    spark.sql("SELECT 1.0 AS x, 5.0 AS v").createOrReplaceTempView("one_pt")
    val single = spark.sql(
      "GRAFT PLOT one_pt X x BINS 4 Y AVG v SMOOTH LOESS").collect()
    assert(single.length == 1 &&
      single.head.getAs[Double]("smooth") == 5.0)
    // render: per-series dashed polyline + point marks with titles
    val svg = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 12 " +
        "Y AVG l_discount SERIES l_returnflag " +
        "SMOOTH LOESS BANDWIDTH 0.5 RENDER 'loess'").collect()
      .head.getAs[String]("svg")
    assert("stroke-dasharray".r.findAllIn(svg).size == 3)
    assert(svg.contains("<title>"))
    assert(svg == spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 12 " +
        "Y AVG l_discount SERIES l_returnflag " +
        "SMOOTH LOESS BANDWIDTH 0.5 RENDER 'loess'").collect()
      .head.getAs[String]("svg"))
  }

  test("SIZE/ALPHA aesthetics: frame columns + scaled marks") {
    Tables(spark, sfDir).registerAll()
    val data = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 10 " +
        "Y AVG l_discount SERIES l_returnflag GEOM POINT " +
        "SIZE l_quantity ALPHA l_tax")
    assert(data.columns.toSeq ==
      Seq("series", "bin", "bin_lo", "bin_hi", "y", "size", "alpha"))
    // the aesthetics ride the SAME single aggregate as the base plot:
    // one extra scan for the min/max pass at most, never a second
    // aggregation pipeline or extra shuffle per bound column
    val p = data.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size <= 2, p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "aes columns re-shuffled instead of sharing one aggregate")
    val svg = spark.sql(
      "GRAFT PLOT lineitem X l_extendedprice BINS 10 " +
        "Y AVG l_discount SERIES l_returnflag GEOM POINT " +
        "SIZE l_quantity ALPHA l_tax RENDER 'aes'").collect()
      .head.getAs[String]("svg")
    val nMarks = data.count()
    assert("<circle ".r.findAllIn(svg).size == nMarks)
    // radius/opacity scales land inside their declared ranges
    val rs = """r="([\d.]+)"""".r.findAllMatchIn(svg)
      .map(_.group(1).toDouble).toSeq
    assert(rs.nonEmpty && rs.forall(r => r >= 2.0 && r <= 8.0))
    val ops = """fill-opacity="([\d.]+)"""".r.findAllMatchIn(svg)
      .map(_.group(1).toDouble).toSeq
    assert(ops.nonEmpty && ops.forall(o => o >= 0.25 && o <= 1.0))
    assert(svg.contains("size=") && svg.contains("alpha="))
  }

  test("GEOMAP PROJECT ORTHO: hemisphere gate + unit-disk marks") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW geo_orth AS SELECT " +
      "CAST(c_custkey % 360 AS DOUBLE) - 180 + 0.5 AS lon, " +
      "CAST((c_custkey * 7) % 180 AS DOUBLE) - 90 + 0.5 AS lat " +
      "FROM customer").collect()
    val flat = spark.sql(
      "GRAFT PLOT geo_orth GEOMAP LAT lat LON lon BINS 12").count()
    val proj = spark.sql(
      "GRAFT PLOT geo_orth GEOMAP LAT lat LON lon BINS 12 " +
        "PROJECT ORTHO LAT0 40 LON0 -30")
    assert(proj.columns.toSeq ==
      Seq("bx", "by", "lat_c", "lon_c", "n", "px", "py"))
    val rows = proj.collect()
    // the far hemisphere is gone, and projected points stay in the
    // unit disk
    assert(rows.length < flat && rows.nonEmpty)
    rows.foreach { r =>
      val px = r.getAs[Double]("px"); val py = r.getAs[Double]("py")
      assert(px * px + py * py <= 1.0 + 1e-9)
    }
    val svg = spark.sql(
      "GRAFT PLOT geo_orth GEOMAP LAT lat LON lon BINS 12 " +
        "PROJECT ORTHO LAT0 40 LON0 -30 RENDER 'globe'").collect()
      .head.getAs[String]("svg")
    // hemisphere disk + one mark per visible tile
    assert("<circle ".r.findAllIn(svg).size == rows.length + 1)
    assert(svg.contains("<title>"))
  }

  test("RANGEY geom: frame + render") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW ry_spec AS " +
      "SELECT c_nationkey AS xk, " +
      "CAST(MIN(c_acctbal) AS DOUBLE) AS ylo, " +
      "CAST(MAX(c_acctbal) AS DOUBLE) AS yhi " +
      "FROM customer GROUP BY c_nationkey").collect()
    val frame = spark.sql(
      "GRAFT PLOT ry_spec RANGEY X xk YMIN ylo YMAX yhi LIMIT 30")
    assert(frame.columns.toSeq == Seq("x", "ymin", "ymax"))
    val n = frame.count()
    assert(n > 0 && n <= 30)
    val svg = spark.sql(
      "GRAFT PLOT ry_spec RANGEY X xk YMIN ylo YMAX yhi LIMIT 30 " +
        "RENDER 'balance ranges'").collect().head.getAs[String]("svg")
    assert(svg.contains("balance ranges"))
    assert("<line ".r.findAllIn(svg).length.toLong == n + 2) // + axes
  }
}
