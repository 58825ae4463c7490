package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PLOT data planning + rendering (reference: modules/visual
  * PlotPlanner / PlotNormalizer — sclera's PLOT clause plans the data
  * series server-side and ships a compact spec to the renderer). The
  * engine-side job: equi-width binning of the x axis (broadcast 1-row
  * min/max, q120's arithmetic) and one hash aggregate per (series,
  * bin) — the renderer receives |series| x |bins| rows no matter how
  * large the input. [[renderSvg]] closes the loop with a
  * deterministic dependency-free SVG bar chart over that bounded
  * result (collecting |series| x |bins| rows is by-construction
  * driver-safe — that bound is the whole point of planning
  * server-side).
  */
object PlotOps {

  /** Bin `xCol` into `bins` equi-width buckets and aggregate `yCol`
    * per (series, bin). `agg` is one of COUNT/SUM/AVG/MIN/MAX; SUM
    * and AVG go through the exact DECIMAL(38,6) accumulation the
    * oracle replicates. */
  def binSeries(
      df: DataFrame, xCol: String, bins: Int,
      agg: String, yCol: String,
      seriesCol: Option[String],
      xRange: Option[(Double, Double)] = None): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol)
    val df1 = domainOf(df, x, xRange)
    val y = col(yCol)
    val yAgg = agg.toUpperCase match {
      case "COUNT" => count(y).as("y")
      case "SUM" =>
        sum(y.cast("decimal(38,6)")).cast("double").as("y")
      case "AVG" =>
        (sum(y.cast("decimal(38,6)")).cast("double") /
          count(y).cast("double")).as("y")
      case "MIN" => min(y).as("y")
      case "MAX" => max(y).as("y")
      case other => throw new IllegalArgumentException(
        s"PLOT: unsupported aggregate '$other'")
    }
    val seriesKey = seriesCol.map(c => col(c).as("series")).toSeq
    val binned = df1
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      // degenerate domain (constant column): width 0 would make the
      // bin NaN/null — everything lands in bucket 0 instead
      .withColumn("bin",
        when(col("_hi") > col("_lo"),
          least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
    binned
      .groupBy((seriesKey :+ col("bin")) :+ col("_lo") :+ col("_w"): _*)
      .agg(yAgg)
      .select((seriesKey.map(_ => col("series")) :+ col("bin") :+
        round(col("_lo") + col("bin") * col("_w"), 6).as("bin_lo") :+
        round(col("_lo") + (col("bin") + 1) * col("_w"), 6)
          .as("bin_hi") :+ col("y")): _*)
      .orderBy(seriesKey.map(_ => col("series")) :+ col("bin"): _*)
  }

  /** Column-bound aesthetic mappings (reference modules/visual
    * parser/PlotParser.scala:332 + model/plot/Aes.scala — SIZE /
    * ALPHA / FILL each bindable to a column with its own scale):
    * the [[binSeries]] planning frame extended with one extra
    * decimal-exact AVG per bound aesthetic column, still ONE scan +
    * ONE hash aggregate and the bounded |series| x |bins| shape.
    * `aes` maps output column name ("size", "alpha") -> input
    * column; the renderer scales each from the frame's own
    * min/max. */
  def binSeriesAes(
      df: DataFrame, xCol: String, bins: Int,
      agg: String, yCol: String,
      seriesCol: Option[String],
      aes: Seq[(String, String)],
      xRange: Option[(Double, Double)] = None): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol)
    val df1 = domainOf(df, x, xRange)
    val y = col(yCol)
    val yAgg = agg.toUpperCase match {
      case "COUNT" => count(y).as("y")
      case "SUM" =>
        sum(y.cast("decimal(38,6)")).cast("double").as("y")
      case "AVG" =>
        (sum(y.cast("decimal(38,6)")).cast("double") /
          count(y).cast("double")).as("y")
      case "MIN" => min(y).as("y")
      case "MAX" => max(y).as("y")
      case other => throw new IllegalArgumentException(
        s"PLOT: unsupported aggregate '$other'")
    }
    val aesAggs = aes.map { case (out, c) =>
      (sum(col(c).cast("decimal(38,6)")).cast("double") /
        count(col(c)).cast("double")).as(out)
    }
    val seriesKey = seriesCol.map(c => col(c).as("series")).toSeq
    val binned = df1
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      .withColumn("bin",
        when(col("_hi") > col("_lo"),
          least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
    binned
      .groupBy((seriesKey :+ col("bin")) :+ col("_lo") :+ col("_w"): _*)
      .agg(yAgg, aesAggs: _*)
      .select((seriesKey.map(_ => col("series")) :+ col("bin") :+
        round(col("_lo") + col("bin") * col("_w"), 6).as("bin_lo") :+
        round(col("_lo") + (col("bin") + 1) * col("_w"), 6)
          .as("bin_hi") :+ col("y")) ++
        aes.map { case (out, _) => col(out) }: _*)
      .orderBy(seriesKey.map(_ => col("series")) :+ col("bin"): _*)
  }

  /** Render a [[binSeriesAes]] frame as point marks whose radius
    * (SIZE column, linear 2..8 px from the frame's min/max) and
    * opacity (ALPHA column, linear 0.25..1.0) encode the bound
    * aesthetics — reference Aes.scala's per-mark scales. Each mark
    * carries a `<title>` tooltip. Deterministic markup. */
  def renderSvgAes(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val cols = frame.columns.toSet
    val hasSeries = cols.contains("series")
    val hasSize = cols.contains("size")
    val hasAlpha = cols.contains("alpha")
    val rows = frame.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("y").doubleValue(),
        if (hasSize) r.getAs[Number]("size").doubleValue() else 0.0,
        if (hasAlpha) r.getAs[Number]("alpha").doubleValue() else 0.0)
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val seriesNames = rows.map(_._1).distinct.sorted
    val nBins = rows.map(_._2).max + 1
    val yMax = math.max(rows.map(_._3).max, 1e-12)
    def scaleOf(vs: Seq[Double], lo: Double, hi: Double)
        : Double => Double = {
      val mn = vs.min; val mx = vs.max
      v => if (mx > mn) lo + (v - mn) / (mx - mn) * (hi - lo)
        else (lo + hi) / 2.0
    }
    val rOf =
      if (hasSize) scaleOf(rows.map(_._4).toSeq, 2.0, 8.0)
      else (_: Double) => 3.0
    val aOf =
      if (hasAlpha) scaleOf(rows.map(_._5).toSeq, 0.25, 1.0)
      else (_: Double) => 1.0
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val groupW = plotW.toDouble / nBins
    def f(v: Double): String = f"$v%.2f"
    def cx(b: Int): Double = mL + (b + 0.5) * groupW
    def cy(v: Double): Double =
      mT + plotH * (1.0 - math.max(v, 0.0) / yMax)
    val marks = seriesNames.zipWithIndex.flatMap { case (s, si) =>
      val color = fills(si % fills.length)
      rows.filter(_._1 == s).sortBy(_._2).map {
        case (_, b, y, sz, al) =>
          val extras =
            (if (hasSize) s" size=$sz" else "") +
              (if (hasAlpha) s" alpha=$al" else "")
          s"""<circle cx="${f(cx(b))}" cy="${f(cy(y))}" """ +
            s"""r="${f(rOf(sz))}" fill="$color" """ +
            s"""fill-opacity="${f(aOf(al))}"><title>""" +
            s"""${if (s.nonEmpty) s"$s " else ""}bin=$b y=$y""" +
            s"""$extras</title></circle>"""
      }
    }
    val legend = seriesNames.zipWithIndex.collect {
      case (s, i) if s.nonEmpty =>
        s"""<text x="${mL + 8 + i * 110}" y="16" font-size="11" """ +
          s"""fill="${fills(i % fills.length)}">$s</text>"""
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      s"""<line x1="$mL" y1="${mT + plotH}" x2="${width - 10}" """ +
      s"""y2="${mT + plotH}" stroke="#333"/>""" +
      s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" """ +
      s"""stroke="#333"/>""" +
      s"""<text x="${mL - 6}" y="${mT + 4}" text-anchor="end" """ +
      s"""font-size="10">${f(yMax)}</text>""" +
      legend.mkString + marks.mkString + "</svg>"
  }

  /** STAT LOESS smoothing layer (reference modules/visual
    * model/plot/Stat.scala:481 LoessSmooth + parser/PlotParser.scala
    * :289 STAT clause): per-series degree-1 local regression
    * (Cleveland 1979, tri-cube weights) over the bounded
    * |series| x |bins| planning frame from [[binSeries]].
    *
    * The fit runs on the BIN INDEX as x: bins are equi-width, and a
    * local linear fit's predictions are invariant under affine x
    * maps, so integer bin distances give the same smoothed values as
    * midpoints while keeping every distance/weight exactly
    * replicable in the DuckDB oracle (integer d, h; r = d/h exact
    * binary division). Driver-side by design: the DP is per-series
    * over <= bins points — model-sized, never data-sized (the same
    * bound every renderer in this file relies on).
    *
    * Output frame: (series?, bin, bin_lo, bin_hi, y, smooth) with y
    * and smooth as DOUBLE; smooth is rounded to 6 decimals (both
    * engines' ROUND agree away from exact half-ties, which the
    * irrational tri-cube weights never hit). */
  def loessSmooth(binned: DataFrame, bandwidth: Double): DataFrame = {
    require(bandwidth > 0.0 && bandwidth <= 1.0,
      "PLOT SMOOTH LOESS: BANDWIDTH must be in (0, 1]")
    val spark = binned.sparkSession
    import spark.implicits._
    val hasSeries = binned.columns.contains("series")
    val pts = binned.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("bin_lo").doubleValue(),
        r.getAs[Number]("bin_hi").doubleValue(),
        r.getAs[Number]("y").doubleValue())
    }.toSeq
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val out = pts.groupBy(_._1).toSeq.flatMap { case (_, grp) =>
      val series = grp.sortBy(_._2)
      val n = series.length
      if (n < 2) series.map(p => (p._1, p._2, p._3, p._4, p._5,
        round6(p._5)))
      else {
        // window size q = the nearest-neighbor count the bandwidth
        // buys (Cleveland's span): at least 2 points, at most all
        val q = math.min(n, math.max(2,
          math.ceil(bandwidth * n).toInt))
        series.map { case (s, xj, lo, hi, yj) =>
          val ds = series.map(p => math.abs(p._2 - xj))
          // h = distance to the q-th nearest point (self included);
          // bins are distinct integers, so q >= 2 gives h >= 1
          val h = ds.sorted.apply(q - 1).toDouble
          var sw = 0.0; var swx = 0.0; var swy = 0.0
          var swxx = 0.0; var swxy = 0.0
          series.zip(ds).foreach { case ((_, xi, _, _, yi), d) =>
            if (d < h) {
              // tri-cube (1 - r^3)^3 via explicit products — the
              // oracle spells the identical arithmetic (POWER may
              // differ from repeated multiplication in the last bit)
              val r = d / h
              val t = 1.0 - r * r * r
              val w = t * t * t
              sw += w; swx += w * xi; swy += w * yi
              swxx += w * xi * xi; swxy += w * xi * yi
            }
          }
          // weighted least squares line through the window; a
          // degenerate window (one effective point) falls back to
          // the weighted mean
          val denom = sw * swxx - swx * swx
          val yhat =
            if (math.abs(denom) < 1e-12) swy / sw
            else {
              val b = (sw * swxy - swx * swy) / denom
              val a = (swy - b * swx) / sw
              a + b * xj
            }
          (s, xj, lo, hi, yj, round6(yhat))
        }
      }
    }.sortBy(t => (t._1, t._2))
    val df = out.toDF("series", "bin", "bin_lo", "bin_hi", "y", "smooth")
    if (hasSeries) df else df.drop("series")
  }

  /** Render a [[loessSmooth]] frame: per-series point marks for the
    * planned y values plus a dashed smoothing polyline, each mark
    * carrying an SVG `<title>` tooltip. Deterministic markup. */
  def renderSvgSmooth(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val hasSeries = frame.columns.contains("series")
    val rows = frame.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("y").doubleValue(),
        r.getAs[Number]("smooth").doubleValue())
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val seriesNames = rows.map(_._1).distinct.sorted
    val nBins = rows.map(_._2).max + 1
    val yMax = math.max(rows.flatMap(r => Seq(r._3, r._4)).max, 1e-12)
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val groupW = plotW.toDouble / nBins
    def f(v: Double): String = f"$v%.2f"
    def cx(b: Int): Double = mL + (b + 0.5) * groupW
    def cy(v: Double): Double =
      mT + plotH * (1.0 - math.max(v, 0.0) / yMax)
    val marks = seriesNames.zipWithIndex.flatMap { case (s, si) =>
      val sRows = rows.filter(_._1 == s).sortBy(_._2).toSeq
      val color = fills(si % fills.length)
      val points = sRows.map { case (_, b, y, _) =>
        s"""<circle cx="${f(cx(b))}" cy="${f(cy(y))}" r="3" """ +
          s"""fill="$color" fill-opacity="0.55"><title>""" +
          s"""${if (s.nonEmpty) s"$s " else ""}bin=$b y=$y""" +
          "</title></circle>"
      }
      val line = {
        val ptsStr = sRows.map { case (_, b, _, sm) =>
          s"${f(cx(b))},${f(cy(sm))}" }
        s"""<polyline points="${ptsStr.mkString(" ")}" fill="none" """ +
          s"""stroke="$color" stroke-width="2" """ +
          s"""stroke-dasharray="5,3"><title>""" +
          s"""${if (s.nonEmpty) s"$s " else ""}loess</title></polyline>"""
      }
      points :+ line
    }
    val legend = seriesNames.zipWithIndex.collect {
      case (s, i) if s.nonEmpty =>
        s"""<text x="${mL + 8 + i * 110}" y="16" font-size="11" """ +
          s"""fill="${fills(i % fills.length)}">$s</text>"""
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      s"""<line x1="$mL" y1="${mT + plotH}" x2="${width - 10}" """ +
      s"""y2="${mT + plotH}" stroke="#333"/>""" +
      s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" """ +
      s"""stroke="#333"/>""" +
      s"""<text x="${mL - 6}" y="${mT + 4}" text-anchor="end" """ +
      s"""font-size="10">${f(yMax)}</text>""" +
      legend.mkString + marks.mkString + "</svg>"
  }

  /** X-axis SCALE SPEC (reference PlotSpec axis/scale specs): an
    * explicit FROM/TO domain filters to [lo, hi) and attaches the
    * bounds as LITERAL columns — no min/max pass, no join of any
    * kind (one scan total), and the grid is stable across runs/
    * corpora, the comparable-dashboards contract. Without it the
    * domain is the observed min/max: one 1-row aggregate broadcast
    * onto the fact (the justified bounded crossJoin). */
  private def domainOf(df: DataFrame,
      x: org.apache.spark.sql.Column,
      xRange: Option[(Double, Double)]): DataFrame = xRange match {
    case Some((lo, hi)) =>
      require(hi > lo, s"PLOT: empty X domain [$lo, $hi)")
      df.where(x >= lit(lo) && x < lit(hi))
        .withColumn("_lo", lit(lo)).withColumn("_hi", lit(hi))
    case None =>
      df.crossJoin(broadcast(df.agg(min(x).as("_lo"), max(x).as("_hi"))))
  }

  /** BAND / ribbon geom planning (reference modules/visual
    * model/plot/Geom.scala:599 Ribbon — a min/avg/max envelope per x
    * position). Same equi-width binning as [[binSeries]]; the per-bin
    * summary is one hash aggregate emitting (y_min, y_avg, y_max) —
    * still |series| x |bins| rows no matter the input size, and the
    * avg goes through the exact DECIMAL(38,6) accumulation the oracle
    * replicates. */
  def binRibbon(
      df: DataFrame, xCol: String, bins: Int, yCol: String,
      seriesCol: Option[String],
      xRange: Option[(Double, Double)] = None): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol)
    val df1 = domainOf(df, x, xRange)
    val y = col(yCol)
    val seriesKey = seriesCol.map(c => col(c).as("series")).toSeq
    val binned = df1
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      // degenerate domain (constant column): width 0 would make the
      // bin NaN/null — everything lands in bucket 0 instead
      .withColumn("bin",
        when(col("_hi") > col("_lo"),
          least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
    binned
      .groupBy((seriesKey :+ col("bin")) :+ col("_lo") :+ col("_w"): _*)
      .agg(
        min(y).cast("double").as("y_min"),
        (sum(y.cast("decimal(38,6)")).cast("double") /
          count(y).cast("double")).as("y_avg"),
        max(y).cast("double").as("y_max"))
      .select((seriesKey.map(_ => col("series")) :+ col("bin") :+
        round(col("_lo") + col("bin") * col("_w"), 6).as("bin_lo") :+
        round(col("_lo") + (col("bin") + 1) * col("_w"), 6)
          .as("bin_hi") :+
        col("y_min") :+ col("y_avg") :+ col("y_max")): _*)
      .orderBy(seriesKey.map(_ => col("series")) :+ col("bin"): _*)
  }

  /** BOX geom planning (reference modules/visual
    * model/plot/Geom.scala:907 BoxPlot — per-x-position five-number
    * summary). One hash aggregate per (series, bin) emitting
    * (min, q1, median, q3, max); quartiles are the exact interpolated
    * `percentile` the rest of the suite already oracle-matches
    * (q74/q124), rounded to 6. The output stays the bounded
    * |series| x |bins| frame — the whiskers/boxes are pure renderer
    * geometry over it. */
  def binBoxStats(
      df: DataFrame, xCol: String, bins: Int, yCol: String,
      seriesCol: Option[String],
      xRange: Option[(Double, Double)] = None): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol)
    val df1 = domainOf(df, x, xRange)
    val seriesKey = seriesCol.map(c => col(c).as("series")).toSeq
    val binned = df1
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      // degenerate domain (constant column): width 0 would make the
      // bin NaN/null — everything lands in bucket 0 instead
      .withColumn("bin",
        when(col("_hi") > col("_lo"),
          least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
      .withColumn("_y", col(yCol).cast("double"))
    binned
      .groupBy((seriesKey :+ col("bin")) :+ col("_lo") :+ col("_w"): _*)
      .agg(
        min(col("_y")).as("y_min"),
        round(expr("percentile(_y, 0.25D)"), 6).as("q1"),
        round(expr("percentile(_y, 0.5D)"), 6).as("med"),
        round(expr("percentile(_y, 0.75D)"), 6).as("q3"),
        max(col("_y")).as("y_max"))
      .select((seriesKey.map(_ => col("series")) :+ col("bin") :+
        round(col("_lo") + col("bin") * col("_w"), 6).as("bin_lo") :+
        round(col("_lo") + (col("bin") + 1) * col("_w"), 6)
          .as("bin_hi") :+
        col("y_min") :+ col("q1") :+ col("med") :+ col("q3") :+
        col("y_max")): _*)
      .orderBy(seriesKey.map(_ => col("series")) :+ col("bin"): _*)
  }

  /** LAYERED + FACETED plot planning (reference modules/visual
    * model/spec/PlotSpec.scala + exec/PlotNormalizer.scala — sclera's
    * layered plot spec with sub-plots/facets). All layers share ONE
    * x binning (comparable scales), faceting adds the facet column to
    * the grouping key with the SAME global bin grid across panels —
    * so the whole plan is still ONE scan + ONE hash aggregate, and
    * the renderer receives a bounded
    * |facets| x |series| x |layers| x |bins| frame. Layer y values
    * are uniformly double (COUNT cast; SUM/AVG through the exact
    * DECIMAL(38,6) accumulation the oracle replicates). */
  def binLayers(
      df: DataFrame, xCol: String, bins: Int,
      layers: Seq[(String, String)],
      seriesCol: Option[String], facetCol: Option[String],
      xRange: Option[(Double, Double)] = None): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    require(layers.nonEmpty, "PLOT: need at least one layer")
    val x = col(xCol)
    val df1 = domainOf(df, x, xRange)
    def layerName(i: Int, agg: String, yCol: String): String =
      s"l${i}_${agg.toLowerCase}_${yCol.toLowerCase}"
    val yAggs = layers.zipWithIndex.map { case ((agg, yCol), i) =>
      val y = col(yCol)
      val e = agg.toUpperCase match {
        case "COUNT" => count(y).cast("double")
        case "SUM" => sum(y.cast("decimal(38,6)")).cast("double")
        case "AVG" =>
          sum(y.cast("decimal(38,6)")).cast("double") /
            count(y).cast("double")
        case "MIN" => min(y).cast("double")
        case "MAX" => max(y).cast("double")
        case other => throw new IllegalArgumentException(
          s"PLOT: unsupported aggregate '$other'")
      }
      e.as(layerName(i, agg, yCol))
    }
    val dims = facetCol.map(c => col(c).as("facet")).toSeq ++
      seriesCol.map(c => col(c).as("series")).toSeq
    val binned = df1
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      // degenerate domain (constant column): width 0 would make the
      // bin NaN/null — everything lands in bucket 0 instead
      .withColumn("bin",
        when(col("_hi") > col("_lo"),
          least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
    val agged = binned
      .groupBy((dims :+ col("bin")) :+ col("_lo") :+ col("_w"): _*)
      .agg(yAggs.head, yAggs.tail: _*)
    // unpivot the per-layer columns into (layer, y) rows — plain
    // projection work on the already-bounded aggregate
    val stackArgs = layers.zipWithIndex.map { case ((agg, yCol), i) =>
      val n = layerName(i, agg, yCol)
      s"'$n', $n"
    }.mkString(", ")
    val dimCols = (if (facetCol.isDefined) Seq(col("facet")) else Nil) ++
      (if (seriesCol.isDefined) Seq(col("series")) else Nil)
    agged
      .select(dimCols ++ Seq(col("bin"),
        round(col("_lo") + col("bin") * col("_w"), 6).as("bin_lo"),
        round(col("_lo") + (col("bin") + 1) * col("_w"), 6)
          .as("bin_hi"),
        expr(s"stack(${layers.size}, $stackArgs)")): _*)
      .withColumnRenamed("col0", "layer")
      .withColumnRenamed("col1", "y")
      .orderBy(dimCols ++ Seq(col("layer"), col("bin")): _*)
  }

  /** Render a [[binLayers]] result as a standalone SVG: facets as a
    * small-multiples grid, first layer as bars, further layers as
    * polylines over bin centers, per-(layer, series) colors — same
    * determinism contract as [[renderSvg]], over the bounded frame. */
  def renderSvgLayers(binned: DataFrame, title: String,
      width: Int = 640, height: Int = 360,
      logY: Boolean = false): String = {
    // y SCALE spec: LOG maps through log10(1+y) — deterministic,
    // handles y=0, order-preserving
    def yf(v: Double): Double = if (logY) math.log10(1.0 + v) else v
    val cols = binned.columns.toSet
    val hasSeries = cols.contains("series")
    val hasFacet = cols.contains("facet")
    val rows = binned.collect().map { r =>
      val fct = if (hasFacet) Option(r.getAs[Any]("facet"))
        .map(_.toString).getOrElse("null") else ""
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (fct, s, r.getAs[String]("layer"),
        r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("y").doubleValue())
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val facets = rows.map(_._1).distinct.sorted
    val layerNames = rows.map(_._3).distinct.sorted
    val seriesNames = rows.map(_._2).distinct.sorted
    val nBins = rows.map(_._4).max + 1
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    def colorOf(layer: String, series: String): String =
      fills((layerNames.indexOf(layer) * seriesNames.size +
        seriesNames.indexOf(series)) % fills.length)
    val nCols = math.min(facets.size, math.max(1,
      math.ceil(math.sqrt(facets.size.toDouble)).toInt))
    val nRows = math.ceil(facets.size.toDouble / nCols).toInt
    val panelW = width / nCols
    val panelH = (height - 20) / nRows
    def f(v: Double): String = f"$v%.2f"
    val panels = facets.zipWithIndex.map { case (fct, pi) =>
      val px = (pi % nCols) * panelW
      val py = 20 + (pi / nCols) * panelH
      val pRows = rows.filter(_._1 == fct)
      val yMax = math.max(pRows.map(_._5).max, 1e-12)
      val mL = 34; val mB = 18; val mT = 16
      val plotW = panelW - mL - 8; val plotH = panelH - mT - mB
      val groupW = plotW.toDouble / nBins
      // first layer: bars grouped by series
      val barLayer = layerNames.head
      val barW = groupW / seriesNames.size * 0.9
      val bars = pRows.filter(_._3 == barLayer)
        .sortBy(r => (r._4, r._2)).map { case (_, s, ly, b, y) =>
          val si = seriesNames.indexOf(s)
          val h = plotH * (yf(y) / yf(yMax))
          val xPos = px + mL + b * groupW + si * barW + groupW * 0.05
          s"""<rect x="${f(xPos)}" y="${f(py + mT + plotH - h)}" """ +
            s"""width="${f(barW)}" height="${f(h)}" """ +
            s"""fill="${colorOf(ly, s)}"><title>$fct $s $ly """ +
            s"""bin=$b y=$y</title></rect>"""
        }
      // further layers: polylines over bin centers, one per series
      val lines = layerNames.tail.flatMap { ly =>
        seriesNames.map { s =>
          val pts = pRows.filter(r => r._3 == ly && r._2 == s)
            .sortBy(_._4).map { case (_, _, _, b, y) =>
              val cx = px + mL + (b + 0.5) * groupW
              val cy = py + mT + plotH * (1.0 - yf(y) / yf(yMax))
              s"${f(cx)},${f(cy)}"
            }
          if (pts.isEmpty) ""
          else s"""<polyline points="${pts.mkString(" ")}" """ +
            s"""fill="none" stroke="${colorOf(ly, s)}" """ +
            s"""stroke-width="1.5"><title>$fct $s $ly</title>""" +
            "</polyline>"
        }
      }
      val label = if (fct.nonEmpty)
        s"""<text x="${px + panelW / 2}" y="${py + 11}" """ +
          s"""text-anchor="middle" font-size="10">$fct</text>"""
        else ""
      val axes =
        s"""<line x1="${px + mL}" y1="${py + mT + plotH}" """ +
          s"""x2="${px + panelW - 8}" y2="${py + mT + plotH}" """ +
          """stroke="#333"/>""" +
          s"""<line x1="${px + mL}" y1="${py + mT}" """ +
          s"""x2="${px + mL}" y2="${py + mT + plotH}" stroke="#333"/>""" +
          s"""<text x="${px + mL - 4}" y="${py + mT + 4}" """ +
          s"""text-anchor="end" font-size="9">${f(yMax)}</text>"""
      label + axes + bars.mkString + lines.mkString
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="13" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      panels.mkString + "</svg>"
  }

  /** Geom renderers (reference modules/visual model/plot/Geom.scala —
    * Point:320, Line:376, Ribbon:599, BoxPlot:907): render a
    * [[binSeries]] frame as points or lines, a [[binRibbon]] frame as
    * a filled min/max envelope with the avg polyline, or a
    * [[binBoxStats]] frame as box-and-whisker glyphs. Same determinism
    * contract as [[renderSvg]] (stable float formatting, sorted
    * series, zero dependencies) over the bounded |series| x |bins|
    * planning frame. */
  def renderSvgGeom(binned: DataFrame, geom: String, title: String,
      width: Int = 640, height: Int = 360,
      logY: Boolean = false, jitter: Boolean = false): String = {
    def yf(v: Double): Double = if (logY) math.log10(1.0 + v) else v
    val cols = binned.columns.toSet
    val hasSeries = cols.contains("series")
    val g = geom.toLowerCase
    // columns the geom reads beyond (series, bin): point/line the
    // single y; ribbon its envelope; box the five-number summary
    val yCols: Seq[String] = g match {
      case "point" | "line" => Seq("y")
      case "ribbon" => Seq("y_min", "y_avg", "y_max")
      case "box" => Seq("y_min", "q1", "med", "q3", "y_max")
      case other => throw new IllegalArgumentException(
        s"PLOT RENDER: unsupported geom '$other'")
    }
    require(yCols.forall(cols.contains),
      s"PLOT RENDER: geom '$g' needs columns ${yCols.mkString(", ")}")
    val rows = binned.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        yCols.map(c => r.getAs[Number](c).doubleValue()))
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val seriesNames = rows.map(_._1).distinct.sorted
    val nBins = rows.map(_._2).max + 1
    val yMax = math.max(rows.flatMap(_._3).max, 1e-12)
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val groupW = plotW.toDouble / nBins
    def f(v: Double): String = f"$v%.2f"
    def cx(b: Int): Double = mL + (b + 0.5) * groupW
    def cy(v: Double): Double = mT + plotH * (1.0 - yf(v) / yf(yMax))
    // POSITION JITTER (reference Position.scala:264 PositionJitter),
    // made DETERMINISTIC: overplotted same-(series, bin) point marks
    // shift by a hash-derived fraction of the slot width — never
    // rand(), so the markup is byte-stable across runs
    def jx(s: String, b: Int): Double =
      if (!jitter) 0.0
      else {
        val h = scala.util.hashing.MurmurHash3
          .stringHash(s"$s|$b") & 0x7fffffff
        (h % 1000 / 1000.0 - 0.5) * groupW * 0.6
      }
    val marks = seriesNames.zipWithIndex.flatMap { case (s, si) =>
      val sRows = rows.filter(_._1 == s).sortBy(_._2).toSeq
      val color = fills(si % fills.length)
      g match {
        case "point" if jitter => sRows.map { case (_, b, ys) =>
          s"""<circle cx="${f(cx(b) + jx(s, b))}" """ +
            s"""cy="${f(cy(ys.head))}" r="3" fill="$color">""" +
            s"""<title>$s bin=$b y=${ys.head}</title></circle>"""
        }
        case "point" => sRows.map { case (_, b, ys) =>
          s"""<circle cx="${f(cx(b))}" cy="${f(cy(ys.head))}" """ +
            s"""r="3" fill="$color"><title>""" +
            s"""${if (s.nonEmpty) s"$s " else ""}bin=$b """ +
            s"""y=${ys.head}</title></circle>"""
        }
        case "line" =>
          val pts = sRows.map { case (_, b, ys) =>
            s"${f(cx(b))},${f(cy(ys.head))}" }
          Seq(s"""<polyline points="${pts.mkString(" ")}" """ +
            s"""fill="none" stroke="$color" stroke-width="1.5">""" +
            s"""<title>$s</title></polyline>""")
        case "ribbon" =>
          // envelope polygon: min edge forward, max edge back, then
          // the avg polyline on top
          val lo = sRows.map { case (_, b, ys) =>
            s"${f(cx(b))},${f(cy(ys.head))}" }
          val hiR = sRows.reverse.map { case (_, b, ys) =>
            s"${f(cx(b))},${f(cy(ys(2)))}" }
          val mid = sRows.map { case (_, b, ys) =>
            s"${f(cx(b))},${f(cy(ys(1)))}" }
          Seq(
            s"""<polygon points="${(lo ++ hiR).mkString(" ")}" """ +
              s"""fill="$color" fill-opacity="0.25" stroke="none">""" +
              s"""<title>$s envelope</title></polygon>""",
            s"""<polyline points="${mid.mkString(" ")}" fill="none" """ +
              s"""stroke="$color" stroke-width="1.5">""" +
              s"""<title>$s avg</title></polyline>""")
        case "box" =>
          // one glyph per bin: whisker min..max, box q1..q3 (series
          // side-by-side within the bin), median tick
          val boxW = groupW / seriesNames.size * 0.6
          sRows.map { case (_, b, ys) =>
            val Seq(mn, q1, med, q3, mx) = ys
            val xMid = mL + b * groupW +
              (si + 0.5) * (groupW / seriesNames.size)
            s"""<line x1="${f(xMid)}" y1="${f(cy(mn))}" """ +
              s"""x2="${f(xMid)}" y2="${f(cy(mx))}" """ +
              s"""stroke="$color"/>""" +
              s"""<rect x="${f(xMid - boxW / 2)}" y="${f(cy(q3))}" """ +
              s"""width="${f(boxW)}" """ +
              s"""height="${f(math.max(cy(q1) - cy(q3), 0.01))}" """ +
              s"""fill="$color" fill-opacity="0.5" stroke="$color">""" +
              s"""<title>${if (s.nonEmpty) s"$s " else ""}bin=$b """ +
              s"""min=$mn q1=$q1 med=$med q3=$q3 max=$mx</title>""" +
              "</rect>" +
              s"""<line x1="${f(xMid - boxW / 2)}" y1="${f(cy(med))}" """ +
              s"""x2="${f(xMid + boxW / 2)}" y2="${f(cy(med))}" """ +
              s"""stroke="$color" stroke-width="2"/>"""
          }
      }
    }
    val legend = seriesNames.zipWithIndex.collect {
      case (s, i) if s.nonEmpty =>
        s"""<text x="${mL + 8 + i * 110}" y="16" font-size="11" """ +
          s"""fill="${fills(i % fills.length)}">$s</text>"""
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      s"""<line x1="$mL" y1="${mT + plotH}" x2="${width - 10}" """ +
      s"""y2="${mT + plotH}" stroke="#333"/>""" +
      s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" """ +
      s"""stroke="#333"/>""" +
      s"""<text x="${mL - 6}" y="${mT + 4}" text-anchor="end" """ +
      s"""font-size="10">${f(yMax)}</text>""" +
      legend.mkString + marks.mkString + "</svg>"
  }

  /** Render a [[binSeries]] result as a standalone SVG bar chart —
    * deterministic markup (stable float formatting, bins in order,
    * series get distinct fills), zero rendering dependencies. Input
    * is the bounded (series?, bin, bin_lo, bin_hi, y) frame. */
  def renderSvg(binned: DataFrame, title: String,
      width: Int = 640, height: Int = 360,
      logY: Boolean = false, position: String = "dodge"): String = {
    def yf(v: Double): Double = if (logY) math.log10(1.0 + v) else v
    val hasSeries = binned.columns.contains("series")
    val rows = binned.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("y").doubleValue())
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val stacked = position.equalsIgnoreCase("stack")
    require(!stacked || !logY,
      "PLOT RENDER: POSITION STACK does not compose with SCALE LOG " +
        "(stacked heights are additive, log heights are not)")
    val seriesNames = rows.map(_._1).distinct.sorted
    val nBins = rows.map(_._2).max + 1
    // stacked bars scale to the tallest bin TOTAL (reference
    // Position.scala:179 PositionStack: cumulative composition);
    // dodged/side-by-side bars to the tallest single series value
    val yMax =
      if (stacked)
        math.max(rows.groupBy(_._2).values
          .map(_.map(r => math.max(r._3, 0.0)).sum).max, 1e-12)
      else math.max(rows.map(_._3).max, 1e-12)
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val groupW = plotW.toDouble / nBins
    val barW =
      if (stacked) groupW * 0.9
      else groupW / seriesNames.length * 0.9
    def f(v: Double): String = f"$v%.2f"
    // per-bin running offsets for the cumulative stack fold
    val offsets = scala.collection.mutable.Map.empty[Int, Double]
    val bars = rows.sortBy(r => (r._2, r._1)).map { case (s, b, y) =>
      val si = seriesNames.indexOf(s)
      val h = plotH * (yf(math.max(y, 0.0)) / yf(yMax))
      val (xPos, yPos) =
        if (stacked) {
          val base = offsets.getOrElse(b, 0.0)
          offsets(b) = base + h
          (mL + b * groupW + groupW * 0.05, mT + plotH - base - h)
        } else
          (mL + b * groupW + si * barW + groupW * 0.05, mT + plotH - h)
      s"""<rect x="${f(xPos)}" y="${f(yPos)}" """ +
        s"""width="${f(barW)}" height="${f(h)}" """ +
        s"""fill="${fills(si % fills.length)}"><title>""" +
        s"""${if (s.nonEmpty) s"$s " else ""}bin=$b y=$y</title></rect>"""
    }
    val legend = seriesNames.zipWithIndex.collect {
      case (s, i) if s.nonEmpty =>
        s"""<text x="${mL + 8 + i * 110}" y="16" font-size="11" """ +
          s"""fill="${fills(i % fills.length)}">$s</text>"""
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      s"""<line x1="$mL" y1="${mT + plotH}" x2="${width - 10}" """ +
      s"""y2="${mT + plotH}" stroke="#333"/>""" +
      s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" """ +
      s"""stroke="#333"/>""" +
      s"""<text x="${mL - 6}" y="${mT + 4}" text-anchor="end" """ +
      s"""font-size="10">${f(yMax)}</text>""" +
      legend.mkString + bars.mkString + "</svg>"
  }

  /** RECT/heatmap planning (reference Geom.scala:822 Rect): the 2D
    * equi-width histogram — ONE scan + ONE hash aggregate to a
    * bounded |xBins| x |yBins| frame; the only join is the 1-row
    * global-bounds broadcast (binSeries' justified shape, twice the
    * columns). */
  def binHeatmap(df: DataFrame, xCol: String, xBins: Int,
      yCol: String, yBins: Int): DataFrame = {
    require(xBins >= 1 && yBins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol); val y = col(yCol)
    val mm = df.agg(
      min(x).as("_xlo"), max(x).as("_xhi"),
      min(y).as("_ylo"), max(y).as("_yhi"))
    val b = df.crossJoin(broadcast(mm))
      .withColumn("_wx",
        (col("_xhi") - col("_xlo")) / lit(xBins.toDouble))
      .withColumn("_wy",
        (col("_yhi") - col("_ylo")) / lit(yBins.toDouble))
      // degenerate domain per axis (constant column): width 0 would
      // make the bin NaN/null — that axis collapses to bucket 0
      .withColumn("bx",
        when(col("_xhi") > col("_xlo"),
          least(floor((x - col("_xlo")) / col("_wx")), lit(xBins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
      .withColumn("by",
        when(col("_yhi") > col("_ylo"),
          least(floor((y - col("_ylo")) / col("_wy")), lit(yBins - 1L)))
          .otherwise(lit(0L))
          .cast("int"))
    b.groupBy(col("bx"), col("by"), col("_xlo"), col("_wx"),
        col("_ylo"), col("_wy"))
      .agg(count(lit(1)).as("n"))
      .select(col("bx"), col("by"),
        round(col("_xlo") + col("bx") * col("_wx"), 6).as("x_lo"),
        round(col("_xlo") + (col("bx") + 1) * col("_wx"), 6).as("x_hi"),
        round(col("_ylo") + col("by") * col("_wy"), 6).as("y_lo"),
        round(col("_ylo") + (col("by") + 1) * col("_wy"), 6).as("y_hi"),
        col("n"))
      .orderBy(col("bx"), col("by"))
  }

  /** Heatmap render: one tile per populated (bx, by) cell, opacity
    * scaled to the max cell count. */
  def renderHeatmapSvg(binned: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = binned.collect().map { r =>
      (r.getAs[Number]("bx").intValue(),
        r.getAs[Number]("by").intValue(),
        r.getAs[Number]("n").longValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: empty heatmap")
    val nx = rows.map(_._1).max + 1
    val ny = rows.map(_._2).max + 1
    val nMax = math.max(rows.map(_._3).max, 1L)
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val cw = plotW.toDouble / nx; val ch = plotH.toDouble / ny
    def f(v: Double): String = f"$v%.2f"
    val tiles = rows.sortBy(r => (r._1, r._2)).map { case (bx, by, n) =>
      val op = n.toDouble / nMax.toDouble
      s"""<rect x="${f(mL + bx * cw)}" """ +
        s"""y="${f(mT + plotH - (by + 1) * ch)}" """ +
        s"""width="${f(cw)}" height="${f(ch)}" fill="#4e79a7" """ +
        s"""fill-opacity="${f(op)}"><title>""" +
        s"""bx=$bx by=$by n=$n</title></rect>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, tiles)
  }

  /** GEOMAP-lite planning (reference model/plot/Geom.scala:1029
    * GeoMap — geographic point/choropleth maps): a lat/lon-binned
    * tile map under the EQUIRECTANGULAR projection (x = lon, y = lat
    * verbatim), over the same bounded-frame contract as
    * [[binHeatmap]]. The domain is the LITERAL world rectangle
    * [-180,180] x [-90,90] — no min/max pass at all, one scan + one
    * hash aggregate to |lonBins| x |lonBins/2| tiles, and the grid is
    * stable across corpora (comparable dashboards). Out-of-range
    * coordinates are dropped, not clamped (bad geo data must not
    * pile into edge tiles). */
  def binGeo(df: DataFrame, latCol: String, lonCol: String,
      lonBins: Int): DataFrame = {
    require(lonBins >= 2, "PLOT GEOMAP: need BINS >= 2")
    val latBins = math.max(lonBins / 2, 1)
    val wx = 360.0 / lonBins; val wy = 180.0 / latBins
    df.select(col(lonCol).cast("double").as("lon"),
        col(latCol).cast("double").as("lat"))
      .where(col("lon") >= -180.0 && col("lon") <= 180.0 &&
        col("lat") >= -90.0 && col("lat") <= 90.0)
      .withColumn("bx",
        least(floor((col("lon") + 180.0) / wx), lit(lonBins - 1L))
          .cast("int"))
      .withColumn("by",
        least(floor((col("lat") + 90.0) / wy), lit(latBins - 1L))
          .cast("int"))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))
      .select(col("bx"), col("by"),
        round(lit(-180.0) + col("bx") * wx, 6).as("lon_lo"),
        round(lit(-180.0) + (col("bx") + 1) * wx, 6).as("lon_hi"),
        round(lit(-90.0) + col("by") * wy, 6).as("lat_lo"),
        round(lit(-90.0) + (col("by") + 1) * wy, 6).as("lat_hi"),
        col("n"))
      .orderBy(col("bx"), col("by"))
  }

  /** GEOMAP-lite render: density tiles on the fixed world grid plus
    * the equator and prime-meridian graticule lines — tiles place by
    * the FULL world extent (not the populated tiles' bounding box),
    * so two corpora render on the identical map. */
  def renderGeoSvg(binned: DataFrame, lonBins: Int, title: String,
      width: Int = 640, height: Int = 360): String = {
    val latBins = math.max(lonBins / 2, 1)
    val rows = binned.collect().map { r =>
      (r.getAs[Number]("bx").intValue(),
        r.getAs[Number]("by").intValue(),
        r.getAs[Number]("n").longValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: empty geomap")
    val nMax = math.max(rows.map(_._3).max, 1L)
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val cw = plotW.toDouble / lonBins; val ch = plotH.toDouble / latBins
    def f(v: Double): String = f"$v%.2f"
    val tiles = rows.sortBy(r => (r._1, r._2)).map { case (bx, by, n) =>
      val op = n.toDouble / nMax.toDouble
      s"""<rect x="${f(mL + bx * cw)}" """ +
        s"""y="${f(mT + plotH - (by + 1) * ch)}" """ +
        s"""width="${f(cw)}" height="${f(ch)}" fill="#4e79a7" """ +
        s"""fill-opacity="${f(op)}"><title>""" +
        s"""lon=[${f(-180 + bx * 360.0 / lonBins)},""" +
        s"""${f(-180 + (bx + 1) * 360.0 / lonBins)}] """ +
        s"""lat=[${f(-90 + by * 180.0 / latBins)},""" +
        s"""${f(-90 + (by + 1) * 180.0 / latBins)}] """ +
        s"""n=$n</title></rect>"""
    }
    val graticule = Seq(
      // equator (lat 0) and prime meridian (lon 0)
      s"""<line x1="$mL" y1="${f(mT + plotH / 2.0)}" """ +
        s"""x2="${mL + plotW}" y2="${f(mT + plotH / 2.0)}" """ +
        s"""stroke="#999" stroke-dasharray="2 2"/>""",
      s"""<line x1="${f(mL + plotW / 2.0)}" y1="$mT" """ +
        s"""x2="${f(mL + plotW / 2.0)}" y2="${mT + plotH}" """ +
        s"""stroke="#999" stroke-dasharray="2 2"/>""")
    svgFrame(title, width, height, mL, mT, plotH, tiles ++ graticule)
  }

  /** Map-projection GEOMAP (reference model/plot/Coordinates.scala
    * CoordMap — sclera's map-projection coordinate systems): the
    * [[binGeo]] tile frame projected ORTHOGRAPHICALLY (Snyder 1987)
    * around a center (lat0, lon0). Pure per-tile trig over the
    * bounded |lonBins| x |latBins| frame — only the near hemisphere
    * (cos c > 0) survives. Degree->radian conversion is spelled
    * `deg * pi / 180` so the oracle replicates the exact arithmetic;
    * px/py round to 6 (sin/cos may differ from DuckDB's libm in the
    * last ulp). Output: (bx, by, lat_c, lon_c, n, px, py). */
  def binGeoOrtho(df: DataFrame, latCol: String, lonCol: String,
      lonBins: Int, lat0: Double, lon0: Double): DataFrame = {
    val latBins = math.max(lonBins / 2, 1)
    val wx = 360.0 / lonBins; val wy = 180.0 / latBins
    val base = binGeo(df, latCol, lonCol, lonBins)
    val latC = lit(-90.0) + (col("by") + 0.5) * wy
    val lonC = lit(-180.0) + (col("bx") + 0.5) * wx
    val phi = latC * math.Pi / 180.0
    val lam = lonC * math.Pi / 180.0
    val phi0 = lit(lat0) * math.Pi / 180.0
    val lam0 = lit(lon0) * math.Pi / 180.0
    val cosc = sin(phi0) * sin(phi) +
      cos(phi0) * cos(phi) * cos(lam - lam0)
    val px = cos(phi) * sin(lam - lam0)
    val py = cos(phi0) * sin(phi) -
      sin(phi0) * cos(phi) * cos(lam - lam0)
    base
      .withColumn("lat_c", round(latC, 6))
      .withColumn("lon_c", round(lonC, 6))
      .withColumn("_cosc", cosc)
      .where(col("_cosc") > 0.0)
      .select(col("bx"), col("by"), col("lat_c"), col("lon_c"),
        col("n"), round(px, 6).as("px"), round(py, 6).as("py"))
      .orderBy(col("bx"), col("by"))
  }

  /** Orthographic GEOMAP render: the projected hemisphere disk with
    * per-tile circle marks placed at (px, py), opacity by density,
    * `<title>` tooltips per mark. Deterministic markup. */
  def renderGeoOrthoSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("bx").intValue(),
        r.getAs[Number]("by").intValue(),
        r.getAs[Number]("n").longValue(),
        r.getAs[Number]("px").doubleValue(),
        r.getAs[Number]("py").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: empty ortho geomap")
    val nMax = math.max(rows.map(_._3).max, 1L)
    val mT = 28
    val cxm = width / 2.0
    val cym = mT + (height - mT - 10) / 2.0
    val rad = math.min(width, height - mT - 10) / 2.0 - 12
    def f(v: Double): String = f"$v%.2f"
    val disk =
      s"""<circle cx="${f(cxm)}" cy="${f(cym)}" r="${f(rad)}" """ +
        """fill="#eef3f8" stroke="#999"/>"""
    val marks = rows.sortBy(r => (r._1, r._2)).map {
      case (bx, by, n, px, py) =>
        val op = n.toDouble / nMax.toDouble
        s"""<circle cx="${f(cxm + px * rad)}" """ +
          s"""cy="${f(cym - py * rad)}" r="3" fill="#4e79a7" """ +
          s"""fill-opacity="${f(op)}"><title>""" +
          s"""bx=$bx by=$by n=$n</title></circle>"""
    }
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      disk + marks.mkString + "</svg>"
  }

  /** TICKER/candlestick render (reference Geom.scala:961 Ticker —
    * the OHLC geom): per candle a low-high wick line and an
    * open-close body rect, rising candles hollow-green, falling
    * solid-red. The frame is the bounded ordered (t, o, h, l, c)
    * row-marks projection the PLOT TICKER statement plans. */
  def renderTickerSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.get(0).toString,
        r.getAs[Number]("o").doubleValue(),
        r.getAs[Number]("h").doubleValue(),
        r.getAs[Number]("l").doubleValue(),
        r.getAs[Number]("c").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no candles")
    val yLo = rows.map(_._4).min
    val yHi = math.max(rows.map(_._3).max, yLo + 1e-12)
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val cw = plotW.toDouble / rows.length
    def f(v: Double): String = f"$v%.2f"
    def py(v: Double): Double =
      mT + plotH * (1.0 - (v - yLo) / (yHi - yLo))
    val marks = rows.zipWithIndex.flatMap { case ((t, o, h, l, c), i) =>
      val cx = mL + (i + 0.5) * cw
      val up = c >= o
      val color = if (up) "#59a14f" else "#e15759"
      val bodyTop = py(math.max(o, c))
      val bodyH = math.max(math.abs(py(o) - py(c)), 0.5)
      Seq(
        s"""<line x1="${f(cx)}" y1="${f(py(h))}" x2="${f(cx)}" """ +
          s"""y2="${f(py(l))}" stroke="$color"/>""",
        s"""<rect x="${f(cx - cw * 0.3)}" y="${f(bodyTop)}" """ +
          s"""width="${f(cw * 0.6)}" height="${f(bodyH)}" """ +
          s"""stroke="$color" """ +
          (if (up) s"""fill="none">""" else s"""fill="$color">""") +
          s"""<title>$t o=$o h=$h l=$l c=$c</title></rect>""")
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** Shared frame for the ROW geoms (one mark per input row —
    * reference Geom.scala:727 Segment, 1049 Text): pixel scales from
    * the marks' own x/y extents, degenerate extents padded so a
    * single mark still renders. */
  private def rowScales(xs: Seq[Double], ys: Seq[Double],
      width: Int, height: Int)
      : (Double => Double, Double => Double, Int, Int, Int) = {
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    def pad(lo: Double, hi: Double): (Double, Double) =
      if (hi > lo) (lo, hi) else (lo - 0.5, hi + 0.5)
    val (xLo, xHi) = pad(xs.min, xs.max)
    val (yLo, yHi) = pad(ys.min, ys.max)
    val px = (v: Double) => mL + plotW * ((v - xLo) / (xHi - xLo))
    val py = (v: Double) => mT + plotH * (1.0 - (v - yLo) / (yHi - yLo))
    (px, py, mL, mT, plotH)
  }

  private def svgFrame(title: String, width: Int, height: Int,
      mL: Int, mT: Int, plotH: Int, marks: Seq[String]): String =
    (s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""") +
      s"""<text x="${width / 2}" y="14" text-anchor="middle" """ +
      s"""font-size="13">$title</text>""" +
      s"""<line x1="$mL" y1="${mT + plotH}" x2="${width - 10}" """ +
      s"""y2="${mT + plotH}" stroke="#333"/>""" +
      s"""<line x1="$mL" y1="$mT" x2="$mL" y2="${mT + plotH}" """ +
      s"""stroke="#333"/>""" + marks.mkString + "</svg>"

  // ---- annotation geoms (reference model/plot/Geom.scala ABLine:642,
  // VLine:683, RegionX:883, RegionY:895) -----------------------------

  /** VLINE planning frame: one vertical reference line per DISTINCT
    * source value, bounded by orderBy + LIMIT (the row-geom
    * discipline — the renderer gets a bounded frame, never the
    * fact). */
  def vlinesFrame(df: DataFrame, xCol: String, limit: Int): DataFrame =
    df.select(col(xCol).cast("double").as("x"))
      .where(col("x").isNotNull)
      .distinct().orderBy(col("x")).limit(limit)

  /** ABLINE planning frame (slope/intercept rows — typically a tiny
    * per-group model relation such as an OLS fit). */
  def ablinesFrame(df: DataFrame, slopeCol: String,
      interceptCol: String, limit: Int): DataFrame =
    df.select(col(slopeCol).cast("double").as("slope"),
        col(interceptCol).cast("double").as("intercept"))
      .orderBy(col("slope"), col("intercept")).limit(limit)

  /** REGION planning frame: [lo, hi] shaded bands (RegionX when laid
    * on the x axis, RegionY on y — the frame is axis-neutral). */
  def regionsFrame(df: DataFrame, loCol: String, hiCol: String,
      limit: Int): DataFrame =
    df.select(col(loCol).cast("double").as("lo"),
        col(hiCol).cast("double").as("hi"))
      .orderBy(col("lo"), col("hi")).limit(limit)

  /** Standalone VLINE render: one dashed vertical line per frame row
    * (reference VLine:683 draws the line across the panel). */
  def renderVlinesSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val xs = frame.collect().map(_.getAs[Number]("x").doubleValue()).toSeq
    require(xs.nonEmpty, "PLOT RENDER: no vlines")
    val (px, _, mL, mT, plotH) = rowScales(xs, Seq(0.0, 1.0),
      width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = xs.map { x =>
      s"""<line x1="${f(px(x))}" y1="$mT" x2="${f(px(x))}" """ +
        s"""y2="${mT + plotH}" stroke="#e15759" stroke-width="1.5" """ +
        s"""stroke-dasharray="4 3"><title>x=$x</title></line>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** Standalone ABLINE render over an explicit x domain [lo, hi]:
    * one line per (slope, intercept) row, endpoints at the domain
    * edges (reference ABLine:642). */
  def renderAblinesSvg(frame: DataFrame, xLo: Double, xHi: Double,
      title: String, width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("slope").doubleValue(),
        r.getAs[Number]("intercept").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no ablines")
    require(xHi > xLo, "PLOT RENDER: ABLINES need FROM < TO")
    val ys = rows.flatMap { case (m, b) => Seq(m * xLo + b, m * xHi + b) }
    val (px, py, mL, mT, plotH) = rowScales(Seq(xLo, xHi), ys,
      width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = rows.map { case (m, b) =>
      s"""<line x1="${f(px(xLo))}" y1="${f(py(m * xLo + b))}" """ +
        s"""x2="${f(px(xHi))}" y2="${f(py(m * xHi + b))}" """ +
        s"""stroke="#4e79a7" stroke-width="1.5" """ +
        s"""stroke-dasharray="6 3"><title>y=${m}x+$b</title></line>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** Standalone REGION render: one shaded band per [lo, hi] row —
    * vertical bands on AXIS X (RegionX:883), horizontal on AXIS Y
    * (RegionY:895). */
  def renderRegionsSvg(frame: DataFrame, axisX: Boolean, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("lo").doubleValue(),
        r.getAs[Number]("hi").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no regions")
    val vals = rows.flatMap(r => Seq(r._1, r._2))
    val (px, py, mL, mT, plotH) = rowScales(
      if (axisX) vals else Seq(0.0, 1.0),
      if (axisX) Seq(0.0, 1.0) else vals, width, height)
    def f(v: Double): String = f"$v%.2f"
    val plotW = width - mL - 10
    val marks = rows.map { case (lo, hi) =>
      if (axisX)
        s"""<rect x="${f(px(lo))}" y="$mT" """ +
          s"""width="${f(math.max(px(hi) - px(lo), 0.01))}" """ +
          s"""height="$plotH" fill="#59a14f" fill-opacity="0.15">""" +
          s"""<title>[$lo,$hi]</title></rect>"""
      else
        s"""<rect x="$mL" y="${f(py(hi))}" width="$plotW" """ +
          s"""height="${f(math.max(py(lo) - py(hi), 0.01))}" """ +
          s"""fill="#59a14f" fill-opacity="0.15">""" +
          s"""<title>[$lo,$hi]</title></rect>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** POINTRANGE planning frame (reference Geom.scala:433 PointRangeY:
    * a point at (x, y) with a vertical [ymin, ymax] range bar — the
    * classic estimate-with-interval mark). Bounded row projection. */
  def pointRangeFrame(df: DataFrame, xCol: String, yCol: String,
      yMinCol: String, yMaxCol: String, limit: Int): DataFrame =
    df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"),
        col(yMinCol).cast("double").as("ymin"),
        col(yMaxCol).cast("double").as("ymax"))
      .orderBy(col("x"), col("y")).limit(limit)

  /** RANGEX planning frame (reference Geom.scala:547 RangeX: a
    * horizontal [xmin, xmax] bar at y — interval/Gantt marks). */
  def rangeXFrame(df: DataFrame, yCol: String, xMinCol: String,
      xMaxCol: String, limit: Int): DataFrame =
    df.select(col(yCol).cast("double").as("y"),
        col(xMinCol).cast("double").as("xmin"),
        col(xMaxCol).cast("double").as("xmax"))
      .orderBy(col("y"), col("xmin"), col("xmax")).limit(limit)

  /** RANGEY planning frame (reference Geom.scala:495 RangeY: the
    * bare vertical [ymin, ymax] bar at x — PointRangeY minus the
    * point mark). Bounded row projection. */
  def rangeYFrame(df: DataFrame, xCol: String, yMinCol: String,
      yMaxCol: String, limit: Int): DataFrame =
    df.select(col(xCol).cast("double").as("x"),
        col(yMinCol).cast("double").as("ymin"),
        col(yMaxCol).cast("double").as("ymax"))
      .orderBy(col("x"), col("ymin"), col("ymax")).limit(limit)

  /** RANGEY render: per row a vertical bar from ymin to ymax at x. */
  def renderRangeYSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("x").doubleValue(),
        r.getAs[Number]("ymin").doubleValue(),
        r.getAs[Number]("ymax").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no ranges")
    val (px, py, mL, mT, plotH) = rowScales(
      rows.map(_._1), rows.flatMap(r => Seq(r._2, r._3)),
      width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = rows.map { case (x, lo, hi) =>
      s"""<line x1="${f(px(x))}" y1="${f(py(lo))}" """ +
        s"""x2="${f(px(x))}" y2="${f(py(hi))}" """ +
        s"""stroke="#4e79a7" stroke-width="3" """ +
        s"""stroke-linecap="round"><title>x=$x """ +
        s"""[$lo,$hi]</title></line>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** POINTRANGE render: per row a filled point and its vertical
    * range bar with end ticks. */
  def renderPointRangeSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("x").doubleValue(),
        r.getAs[Number]("y").doubleValue(),
        r.getAs[Number]("ymin").doubleValue(),
        r.getAs[Number]("ymax").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no pointranges")
    val (px, py, mL, mT, plotH) = rowScales(rows.map(_._1),
      rows.flatMap(r => Seq(r._2, r._3, r._4)), width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = rows.flatMap { case (x, y, lo, hi) =>
      Seq(
        s"""<line x1="${f(px(x))}" y1="${f(py(lo))}" """ +
          s"""x2="${f(px(x))}" y2="${f(py(hi))}" """ +
          s"""stroke="#4e79a7" stroke-width="1.5"/>""",
        s"""<circle cx="${f(px(x))}" cy="${f(py(y))}" r="3" """ +
          s"""fill="#4e79a7"><title>($x, $y) """ +
          s"""[$lo,$hi]</title></circle>""")
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** RANGEX render: per row a horizontal bar from xmin to xmax at y. */
  def renderRangeXSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("y").doubleValue(),
        r.getAs[Number]("xmin").doubleValue(),
        r.getAs[Number]("xmax").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no ranges")
    val (px, py, mL, mT, plotH) = rowScales(
      rows.flatMap(r => Seq(r._2, r._3)), rows.map(_._1),
      width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = rows.map { case (y, lo, hi) =>
      s"""<line x1="${f(px(lo))}" y1="${f(py(y))}" """ +
        s"""x2="${f(px(hi))}" y2="${f(py(y))}" """ +
        s"""stroke="#4e79a7" stroke-width="3" """ +
        s"""stroke-linecap="round"><title>y=$y """ +
        s"""[$lo,$hi]</title></line>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }

  /** BLANK geom planning (reference Geom.scala:304 Blank — draws no
    * marks; its job is establishing the panel's scales, the ggplot
    * `geom_blank` contract): the 1-row (x_lo, x_hi, y_lo, y_hi)
    * domain frame — one aggregate, nothing else. */
  def blankFrame(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg(
      min(col(xCol).cast("double")).as("x_lo"),
      max(col(xCol).cast("double")).as("x_hi"),
      min(col(yCol).cast("double")).as("y_lo"),
      max(col(yCol).cast("double")).as("y_hi"))

  /** BLANK render: the axes frame scaled to the domain, zero marks. */
  def renderBlankSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val r = frame.collect().head
    // an empty/all-NULL source yields NULL bounds — fail with the
    // renderer family's message, not a bare NullPointerException
    require((0 until 4).forall(i => !r.isNullAt(i)),
      "PLOT RENDER: empty domain (no non-null rows to scale)")
    val (_, _, mL, mT, plotH) = rowScales(
      Seq(r.getAs[Number]("x_lo").doubleValue(),
        r.getAs[Number]("x_hi").doubleValue()),
      Seq(r.getAs[Number]("y_lo").doubleValue(),
        r.getAs[Number]("y_hi").doubleValue()), width, height)
    svgFrame(title, width, height, mL, mT, plotH, Seq.empty)
  }

  /** Annotation OVERLAY (the reference's layered usage: every
    * control-chart plot wants a VLine/HLine/region on top of its
    * series): literal reference lines / shaded regions appended to a
    * rendered [[binSeries]]-family SVG. The plot box and domains are
    * reconstructed from the binned frame — bin_lo/bin_hi carry the x
    * grid (xLo = bin_lo - bin*w, xHi = xLo + nBins*w over the
    * populated max bin), and the y scale is the renderers' own
    * [0, yMax] over whichever y columns the frame carries — so the
    * overlay shares the exact px/py mapping of the marks beneath
    * it. Marks are inserted before the closing tag, i.e. drawn on
    * top. */
  def annotate(svg: String, binned: DataFrame,
      vlines: Seq[Double], hlines: Seq[Double],
      regionsX: Seq[(Double, Double)], regionsY: Seq[(Double, Double)],
      ablines: Seq[(Double, Double)] = Seq.empty,
      logY: Boolean = false,
      width: Int = 640, height: Int = 360): String = {
    if (vlines.isEmpty && hlines.isEmpty && regionsX.isEmpty &&
      regionsY.isEmpty && ablines.isEmpty) return svg
    def yf(v: Double): Double = if (logY) math.log10(1.0 + v) else v
    val cols = binned.columns.toSet
    val yCols = Seq("y", "y_min", "y_avg", "y_max", "q1", "med", "q3")
      .filter(cols.contains)
    val rows = binned.select("bin", ("bin_lo" +: "bin_hi" +: yCols): _*)
      .collect()
    require(rows.nonEmpty, "PLOT RENDER: empty frame under annotation")
    val w0 = rows.head.getAs[Number]("bin_hi").doubleValue() -
      rows.head.getAs[Number]("bin_lo").doubleValue()
    val xLo = rows.map(r => r.getAs[Number]("bin_lo").doubleValue() -
      r.getAs[Number]("bin").intValue() * w0).min
    val nBins = rows.map(_.getAs[Number]("bin").intValue()).max + 1
    val xHi = xLo + nBins * w0
    val yMax = math.max(rows.flatMap(r =>
      yCols.map(c => r.getAs[Number](c).doubleValue())).max, 1e-12)
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    def f(v: Double): String = f"$v%.2f"
    def cx(v: Double): Double =
      mL + plotW * ((v - xLo) / math.max(xHi - xLo, 1e-12))
    def cy(v: Double): Double =
      mT + plotH * (1.0 - yf(v) / yf(yMax))
    val marks =
      regionsX.map { case (lo, hi) =>
        s"""<rect x="${f(cx(lo))}" y="$mT" """ +
          s"""width="${f(math.max(cx(hi) - cx(lo), 0.01))}" """ +
          s"""height="$plotH" fill="#59a14f" fill-opacity="0.15">""" +
          s"""<title>x in [$lo,$hi]</title></rect>"""
      } ++
      regionsY.map { case (lo, hi) =>
        s"""<rect x="$mL" y="${f(cy(hi))}" width="$plotW" """ +
          s"""height="${f(math.max(cy(lo) - cy(hi), 0.01))}" """ +
          s"""fill="#59a14f" fill-opacity="0.15">""" +
          s"""<title>y in [$lo,$hi]</title></rect>"""
      } ++
      vlines.map { x =>
        s"""<line x1="${f(cx(x))}" y1="$mT" x2="${f(cx(x))}" """ +
          s"""y2="${mT + plotH}" stroke="#e15759" """ +
          s"""stroke-width="1.5" stroke-dasharray="4 3">""" +
          s"""<title>x=$x</title></line>"""
      } ++
      hlines.map { y =>
        s"""<line x1="$mL" y1="${f(cy(y))}" x2="${width - 10}" """ +
          s"""y2="${f(cy(y))}" stroke="#e15759" """ +
          s"""stroke-width="1.5" stroke-dasharray="4 3">""" +
          s"""<title>y=$y</title></line>"""
      } ++
      ablines.map { case (m, b) =>
        s"""<line x1="${f(cx(xLo))}" y1="${f(cy(m * xLo + b))}" """ +
          s"""x2="${f(cx(xHi))}" y2="${f(cy(m * xHi + b))}" """ +
          s"""stroke="#4e79a7" stroke-width="1.5" """ +
          s"""stroke-dasharray="6 3"><title>y=${m}x+$b</title></line>"""
      }
    svg.stripSuffix("</svg>") + marks.mkString + "</svg>"
  }

  /** SEGMENT geom (reference Geom.scala:727): one line per row from
    * (x, y) to (xend, yend), optional arrowhead. The frame must be
    * the bounded row-marks projection the PLOT SEGMENTS statement
    * plans (ordered + LIMITed). */
  def renderSegmentsSvg(frame: DataFrame, arrow: Boolean,
      title: String, width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[Number]("x").doubleValue(),
        r.getAs[Number]("xend").doubleValue(),
        r.getAs[Number]("y").doubleValue(),
        r.getAs[Number]("yend").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no segments")
    val (px, py, mL, mT, plotH) = rowScales(
      rows.flatMap(r => Seq(r._1, r._2)),
      rows.flatMap(r => Seq(r._3, r._4)), width, height)
    def f(v: Double): String = f"$v%.2f"
    val defs =
      if (arrow)
        """<defs><marker id="ah" viewBox="0 0 8 8" refX="7" """ +
          """refY="4" markerWidth="6" markerHeight="6" """ +
          """orient="auto"><path d="M0,0 L8,4 L0,8 z" """ +
          """fill="#4e79a7"/></marker></defs>"""
      else ""
    val markerAttr = if (arrow) """ marker-end="url(#ah)"""" else ""
    val marks = rows.map { case (x0, x1, y0, y1) =>
      s"""<line x1="${f(px(x0))}" y1="${f(py(y0))}" """ +
        s"""x2="${f(px(x1))}" y2="${f(py(y1))}" """ +
        s"""stroke="#4e79a7" stroke-width="1.5"$markerAttr>""" +
        s"""<title>($x0,$y0)-($x1,$y1)</title></line>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, defs +: marks)
  }

  /** TEXT geom (reference Geom.scala:1049): one label per row at
    * (x, y), mid-anchored like the reference's hjust/vjust 0.5
    * defaults. */
  def renderTextSvg(frame: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val rows = frame.collect().map { r =>
      (r.getAs[String]("label"),
        r.getAs[Number]("x").doubleValue(),
        r.getAs[Number]("y").doubleValue())
    }.toSeq
    require(rows.nonEmpty, "PLOT RENDER: no labels")
    val (px, py, mL, mT, plotH) = rowScales(
      rows.map(_._2), rows.map(_._3), width, height)
    def f(v: Double): String = f"$v%.2f"
    val marks = rows.map { case (label, x, y) =>
      val esc = label.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      s"""<text x="${f(px(x))}" y="${f(py(y))}" """ +
        s"""text-anchor="middle" dominant-baseline="middle" """ +
        s"""font-size="11" fill="#333">$esc</text>"""
    }
    svgFrame(title, width, height, mL, mT, plotH, marks)
  }
}
