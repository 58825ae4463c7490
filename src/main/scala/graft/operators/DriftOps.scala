package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift operators: two-sample Kolmogorov-Smirnov of
  * each group's numeric-column distribution against the REST of the
  * table, on an equi-width bin grid (the binning is what makes the
  * statistic one aggregate at 100 TB — exact per-row ECDFs would be
  * a global sort per group).
  *
  * Shape: one 1-row min/max aggregate (broadcast), ONE fact
  * aggregate to (group, bin) counts, then everything lives on the
  * <= #groups * bins frame. The KS gap stays exact integer
  * cross-multiplication until one final double division. q253 is the
  * documents instance; GRAFT DRIFT <t> VALUE <col> GROUP <col>
  * BINS <n> is the SQL front door.
  */
object DriftOps {

  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
      bins: Int): DataFrame = {
    val data = df.select(col(groupCol).as("grp"),
      col(valueCol).as("v"))
    val bounds = data.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // `binned` is read by the spine (twice) + the grid join, and
    // `grid` feeds four consumers — each re-runs the fact aggregate.
    // Deliberately NOT cached (measured this round): persisting both
    // frames regressed q253 0.5s -> 1.2s at sf0.1 — every cache is a
    // materialization barrier that serializes the plan into more
    // sequential jobs and blocks Catalyst from collapsing the
    // consumers' subtrees, while the re-run aggregate is one
    // codegen'd map-side-combined pass. At 100 TB the right lever is
    // the caller persisting its INPUT once if it drifts several
    // columns, not this operator caching a per-call frame.
    val binned = data.crossJoin(broadcast(bounds))
      .select(col("grp"),
        floor((col("v") - col("mn")) * bins
          / (col("mx") - col("mn") + 1)).as("bin"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val spine = binned.select(col("grp")).distinct()
      .crossJoin(binned.select(col("bin")).distinct())
    val grid = spine.join(binned, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
    val cum = grid.withColumn("cum_grp",
      sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("bin"))))
    val glob = grid.groupBy(col("bin")).agg(sum(col("c")).as("g"))
      .withColumn("cum_g", sum(col("g")).over(Window.orderBy(col("bin"))))
      .select(col("bin"), col("cum_g"))
    val tot = grid.groupBy(col("grp")).agg(sum(col("c")).as("n_grp"))
    val n = grid.agg(sum(col("c")).as("n_all"))
    cum.select(col("grp"), col("bin"), col("cum_grp"))
      .join(broadcast(glob), Seq("bin"))
      .join(broadcast(tot), Seq("grp"))
      .crossJoin(broadcast(n))
      .groupBy(col("grp"), col("n_grp"), col("n_all"))
      .agg(max(abs(col("cum_grp") * (col("n_all") - col("n_grp"))
        - (col("cum_g") - col("cum_grp")) * col("n_grp"))).as("num"))
      .select(col("grp"), col("n_grp"),
        round(col("num").cast("double")
          / (col("n_grp") * (col("n_all") - col("n_grp")))
            .cast("double"), 6).as("ks"))
      .orderBy(col("grp"))
  }
}
