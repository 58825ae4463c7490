package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PLOT data planning (reference: modules/visual PlotPlanner /
  * PlotNormalizer — sclera's PLOT clause plans the data series server
  * -side and ships a compact spec to the renderer). The engine-side
  * job is exactly this: equi-width binning of the x axis (broadcast
  * 1-row min/max, q120's arithmetic) and one hash aggregate per
  * (series, bin) — the renderer receives |series| x |bins| rows no
  * matter how large the input. Rendering itself is client-surface
  * and out of scope for an engine library.
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
}
