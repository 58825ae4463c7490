package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Series-smoothing operators over an ordered (time, value) relation
  * (reference analogue: the analytics evaluators the ORDERED BY
  * family feeds; the GRAFT SMOOTH statement is their SQL front door).
  *
  * Scale shape shared with q257/q303/q304: the input is expected to be
  * an already-bounded series (a calendar-grain aggregate of the fact,
  * never the raw fact) — the sequential recurrence folds over the
  * sorted array INSIDE one aggregate row, so the distributed work is
  * exactly one collect_list aggregate. The recurrences repeat every
  * shared subexpression textually, keeping the IEEE double operation
  * sequence reproducible by a recursive-CTE oracle.
  */
object SmoothOps {

  /** Local-level Kalman filter: per step predict (p += q), gain
    * (k = p / (p + r)), update (l += k * (z - l); p *= 1 - k); init
    * l = first value, p = r. Emits one row per observation from the
    * second on: (time, actual, one-step pred, gain, filtered). */
  def kalman(df: DataFrame, timeCol: String, valueCol: String,
      q: Double, r: Double): DataFrame = {
    val tType = df.schema(timeCol).dataType.sql
    val series = df
      .select(col(timeCol).as("t"), col(valueCol).cast("double").as("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
    val qL = s"${q}D"
    val rL = s"${r}D"
    val gain = s"(acc.p + $qL) / (acc.p + $qL + $rL)"
    val folded = series.select(expr(
      s"""aggregate(
         |  slice(xs, 2, greatest(size(xs) - 1, 0)),
         |  named_struct(
         |    'l', if(size(xs) > 0, xs[0].x, cast(null as double)),
         |    'p', $rL,
         |    'f', cast(array() as array<struct<t: $tType, a: double,
         |      pred: double, gain: double, filt: double>>)),
         |  (acc, e) -> named_struct(
         |    'l', acc.l + ($gain) * (e.x - acc.l),
         |    'p', (1.0D - ($gain)) * (acc.p + $qL),
         |    'f', array_append(acc.f, named_struct(
         |      't', e.t, 'a', e.x,
         |      'pred', acc.l,
         |      'gain', $gain,
         |      'filt', acc.l + ($gain) * (e.x - acc.l)))))
         |""".stripMargin.trim).as("st"))
    folded.select(explode(col("st.f")).as("e"))
      .select(col("e.t").as(timeCol),
        round(col("e.a"), 6).as("actual"),
        round(col("e.pred"), 6).as("pred"),
        round(col("e.gain"), 6).as("gain"),
        round(col("e.filt"), 6).as("filt"))
  }

  /** Holt linear (double) exponential smoothing: init l = first value,
    * b = 0; per step l' = a*z + (1-a)*(l+b), b' = b_*(l'-l) + (1-b_)*b,
    * one-step forecast l + b emitted before the update. The complement
    * weights are precomputed in Scala and embedded as literals (for
    * the clean constants in use, 1-a round-trips to the exact literal
    * the oracle writes). */
  def holt(df: DataFrame, timeCol: String, valueCol: String,
      alpha: Double, beta: Double): DataFrame = {
    val tType = df.schema(timeCol).dataType.sql
    val series = df
      .select(col(timeCol).as("t"), col(valueCol).cast("double").as("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
    val aL = s"${alpha}D"; val a1L = s"${1.0 - alpha}D"
    val bL = s"${beta}D"; val b1L = s"${1.0 - beta}D"
    val lnew = s"$aL * e.x + $a1L * (acc.l + acc.b)"
    val folded = series.select(expr(
      s"""aggregate(
         |  slice(xs, 2, greatest(size(xs) - 1, 0)),
         |  named_struct(
         |    'l', if(size(xs) > 0, xs[0].x, cast(null as double)),
         |    'b', 0.0D,
         |    'f', cast(array() as array<struct<t: $tType, a: double,
         |      fc: double>>)),
         |  (acc, e) -> named_struct(
         |    'l', $lnew,
         |    'b', $bL * (($lnew) - acc.l) + $b1L * acc.b,
         |    'f', array_append(acc.f, named_struct(
         |      't', e.t, 'a', e.x, 'fc', acc.l + acc.b))))
         |""".stripMargin.trim).as("st"))
    folded.select(explode(col("st.f")).as("e"))
      .select(col("e.t").as(timeCol),
        round(col("e.a"), 6).as("actual"),
        round(col("e.fc"), 6).as("forecast"),
        round(abs(col("e.a") - col("e.fc")), 6).as("abs_err"))
  }

  /** EWMA control chart (Lucas & Saccucci 1990): z_t = lambda x_t +
    * (1-lambda) z_{t-1} seeded at the series mean, against the
    * TIME-VARYING limits mu +/- L sigma sqrt(lambda/(2-lambda)
    * (1-(1-lambda)^{2t})), sigma estimated as the average moving
    * range / d2 (1.128). Both the moment pass and the chart fold run
    * IN TIME ORDER inside one aggregate row, and the band term rides
    * the fold as a pure (1-lambda)^2-multiplication chain — never
    * POW. Literals are decimal-exact squares of the complement
    * weight so the identical expression tree matches the
    * q320_ewma_chart gate query when fed the same series.
    *
    * The fold lambda references ONLY the accumulator, the element,
    * and literals: a column like sigma must never appear inside the
    * lambda body — projection collapse inlines the column's defining
    * expression (here an O(n) moments fold) into the per-element
    * evaluation, turning the linear fold O(n^2). The band term is
    * emitted bare and the L*sigma scaling happens after the explode
    * (same left-assoc multiplication tree, so the IEEE doubles — and
    * the oracle hash — are unchanged). */
  def ewma(df: DataFrame, timeCol: String, valueCol: String,
      lambda: Double, l: Double): DataFrame = {
    val tType = df.schema(timeCol).dataType.sql
    val series = df
      .select(col(timeCol).as("t"), col(valueCol).cast("double").as("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
    val om = 1.0 - lambda
    val lamL = s"${lambda}D"; val omL = s"${om}D"
    val om2L = s"${BigDecimal(om.toString) * BigDecimal(om.toString)}D"
    val twoL = s"${2.0 - lambda}D"
    val moments = series.select(col("xs"), expr(
      """aggregate(
        |  xs,
        |  named_struct('sx', 0.0D, 'n', 0L, 'smr', 0.0D, 'nmr', 0L,
        |    'prev', cast(null as double)),
        |  (acc, e) -> named_struct(
        |    'sx', acc.sx + e.x,
        |    'n', acc.n + 1L,
        |    'smr', acc.smr
        |      + if(acc.prev is null, 0.0D, abs(e.x - acc.prev)),
        |    'nmr', acc.nmr + if(acc.prev is null, 0L, 1L),
        |    'prev', e.x))
        |""".stripMargin.trim).as("mo"))
      .select(col("xs"),
        (col("mo.sx") / col("mo.n").cast("double")).as("mu"),
        (col("mo.smr") / col("mo.nmr").cast("double") / lit(1.128))
          .as("sigma"))
    val folded = moments.select(col("mu"), col("sigma"), expr(
      s"""aggregate(
         |  xs,
         |  named_struct('z', mu, 'w', CAST(1.0 AS DOUBLE),
         |    'f', cast(array() as array<struct<t: $tType, x: double,
         |      z: double, band: double>>)),
         |  (acc, e) -> named_struct(
         |    'z', $lamL * e.x + $omL * acc.z,
         |    'w', acc.w * $om2L,
         |    'f', array_append(acc.f, named_struct(
         |      't', e.t, 'x', e.x,
         |      'z', $lamL * e.x + $omL * acc.z,
         |      'band', ($lamL / $twoL) * (1.0D - acc.w * $om2L)))))
         |""".stripMargin.trim).as("st"))
    val hw = lit(l) * col("sigma") * sqrt(col("e.band"))
    folded.select(col("mu"), col("sigma"), explode(col("st.f")).as("e"))
      .select(col("e.t").as(timeCol),
        round(col("e.x"), 6).as("actual"),
        round(col("e.z"), 6).as("z"),
        round(col("mu") + hw, 6).as("ucl"),
        round(col("mu") - hw, 6).as("lcl"))
      .withColumn("outf",
        col("z") > col("ucl") || col("z") < col("lcl"))
  }

  /** Additive Holt-Winters triple smoothing with season length `m`:
    * init from the first m observations (level = their mean, trend 0,
    * seasonal s_i = x_i - level); per step the one-step forecast
    * l + b + s_idx is emitted before the level/trend/seasonal update.
    * The seasonal state rides as m scalar slots with a CASE-selected
    * read and an if-guarded write per slot (generated here for the
    * statement's m), so the identical expression tree is expressible
    * as a recursive-CTE oracle with no list mutation. */
  def holtWinters(df: DataFrame, timeCol: String, valueCol: String,
      m: Int, alpha: Double, beta: Double, gamma: Double): DataFrame = {
    require(m >= 2, s"season length $m must be >= 2")
    val tType = df.schema(timeCol).dataType.sql
    val series = df
      .select(col(timeCol).as("t"), col(valueCol).cast("double").as("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
    val aL = s"${alpha}D"; val a1L = s"${1.0 - alpha}D"
    val bL = s"${beta}D"; val b1L = s"${1.0 - beta}D"
    val gL = s"${gamma}D"; val g1L = s"${1.0 - gamma}D"
    val sidx = s"CASE (acc.t - 1) % $m " +
      (0 until m - 1).map(i => s"WHEN $i THEN acc.s$i").mkString(" ") +
      s" ELSE acc.s${m - 1} END"
    val lnew = s"$aL * (e.x - ($sidx)) + $a1L * (acc.l + acc.b)"
    val l0 = s"aggregate(slice(xs, 1, $m), 0.0D, (a, e) -> a + e.x)" +
      s" / ${m}.0D"
    def slot(i: Int): String =
      s"'s$i', if((acc.t - 1) % $m = $i, " +
        s"$gL * (e.x - ($lnew)) + $g1L * acc.s$i, acc.s$i)"
    def initSlot(i: Int): String =
      s"'s$i', if(size(xs) > $i, xs[$i].x, cast(null as double)) - $l0"
    val folded = series.select(expr(
      s"""aggregate(
         |  slice(xs, ${m + 1}, greatest(size(xs) - $m, 0)),
         |  named_struct('t', ${m + 1}, 'l', $l0, 'b', 0.0D,
         |    ${(0 until m).map(initSlot).mkString(",\n    ")},
         |    'f', cast(array() as array<struct<t: $tType, a: double,
         |      fc: double>>)),
         |  (acc, e) -> named_struct(
         |    't', acc.t + 1,
         |    'l', $lnew,
         |    'b', $bL * (($lnew) - acc.l) + $b1L * acc.b,
         |    ${(0 until m).map(slot).mkString(",\n    ")},
         |    'f', array_append(acc.f, named_struct(
         |      't', e.t, 'a', e.x,
         |      'fc', acc.l + acc.b + ($sidx)))))
         |""".stripMargin.trim).as("st"))
    folded.select(explode(col("st.f")).as("e"))
      .select(col("e.t").as(timeCol),
        round(col("e.a"), 6).as("actual"),
        round(col("e.fc"), 6).as("forecast"),
        round(abs(col("e.a") - col("e.fc")), 6).as("abs_err"))
  }
}
