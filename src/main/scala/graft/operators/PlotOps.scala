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
      seriesCol: Option[String]): DataFrame = {
    require(bins >= 1, "PLOT: need BINS >= 1")
    val x = col(xCol)
    val mm = df.agg(min(x).as("_lo"), max(x).as("_hi"))
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
    val binned = df.crossJoin(broadcast(mm))
      .withColumn("_w", (col("_hi") - col("_lo")) / lit(bins.toDouble))
      .withColumn("bin",
        least(floor((x - col("_lo")) / col("_w")), lit(bins - 1L))
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

  /** Render a [[binSeries]] result as a standalone SVG bar chart —
    * deterministic markup (stable float formatting, bins in order,
    * series get distinct fills), zero rendering dependencies. Input
    * is the bounded (series?, bin, bin_lo, bin_hi, y) frame. */
  def renderSvg(binned: DataFrame, title: String,
      width: Int = 640, height: Int = 360): String = {
    val hasSeries = binned.columns.contains("series")
    val rows = binned.collect().map { r =>
      val s = if (hasSeries) Option(r.getAs[Any]("series"))
        .map(_.toString).getOrElse("null") else ""
      (s, r.getAs[Number]("bin").intValue(),
        r.getAs[Number]("y").doubleValue())
    }
    require(rows.nonEmpty, "PLOT RENDER: empty series")
    val seriesNames = rows.map(_._1).distinct.sorted
    val nBins = rows.map(_._2).max + 1
    val yMax = math.max(rows.map(_._3).max, 1e-12)
    val fills = Seq("#4e79a7", "#f28e2b", "#59a14f", "#e15759",
      "#76b7b2", "#edc948")
    val mL = 40; val mB = 24; val mT = 28
    val plotW = width - mL - 10; val plotH = height - mT - mB
    val groupW = plotW.toDouble / nBins
    val barW = groupW / seriesNames.length * 0.9
    def f(v: Double): String = f"$v%.2f"
    val bars = rows.sortBy(r => (r._2, r._1)).map { case (s, b, y) =>
      val si = seriesNames.indexOf(s)
      val h = plotH * (y / yMax)
      val xPos = mL + b * groupW + si * barW + groupW * 0.05
      s"""<rect x="${f(xPos)}" y="${f(mT + plotH - h)}" """ +
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
}
