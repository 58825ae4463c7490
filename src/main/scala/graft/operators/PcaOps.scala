package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column, the classic two-phase
  * shape: ONE pass accumulates the Gram matrix and column sums
  * per-partition (d×d doubles of state per task, merged pairwise —
  * never a shuffle of row-level data), the d×d covariance eigensolves
  * on the driver (cyclic Jacobi — the matrix is a model-sized
  * artifact, 64×64 here, like k-means centroids), and projection is a
  * broadcast-literal expression over the original rows. At 100 TB the
  * fit costs one scan with O(d²) per-task state and an O(P·d²) merge;
  * nothing row-level ever reaches the driver.
  *
  * Determinism discipline: the Gram partials merge in partition order
  * inside `reduce`, but double addition still reorders under retries,
  * so eigen-derived numbers are verified with TOLERANCE verdicts
  * (orthonormality, Σλ = trace, Var(proj_k) = λ_k) rather than
  * hash-matched; the hash-checked columns (n, covariance trace) go
  * through the exact-decimal-sum path (round → DECIMAL → order-free
  * exact SUM) on both engines. Eigenvectors are sign-normalized
  * (largest-|component| positive) so repeated fits agree.
  *
  * Reference analogue: sclera's CLUSTERED/analytics model staging
  * (modules/core/src/main/scala/analytics) — train once, apply
  * relationally.
  */
object PcaOps {

  case class PcaModel(
      dim: Int, n: Long, mean: Array[Double],
      eigvals: Array[Double], // descending
      eigvecs: Array[Array[Double]]) // eigvecs(j) = j-th eigenvector

  private case class Partial(n: Long, s: Array[Double], g: Array[Double])

  /** One-pass covariance fit + driver-side Jacobi eigensolve. */
  def fit(vectors: DataFrame, vecCol: String): PcaModel = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val data: Dataset[Seq[Double]] = vectors
      .select(transform(col(vecCol), v => v.cast("double")))
      .as[Seq[Double]]
    val zero = Partial(0L, Array.empty, Array.empty)
    val merged = data.mapPartitions { it =>
      var n = 0L
      var s: Array[Double] = null
      var g: Array[Double] = null // upper triangle, row-major
      it.foreach { v =>
        val d = v.length
        if (s == null) { s = new Array[Double](d); g = new Array[Double](d * (d + 1) / 2) }
        n += 1
        var i = 0; var t = 0
        while (i < d) {
          val vi = v(i)
          s(i) += vi
          var j = i
          while (j < d) { g(t) += vi * v(j); j += 1; t += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single(Partial(n, s, g))
    }(Encoders.product[Partial])
      .reduce((a, b) =>
        if (a.n == 0) b else if (b.n == 0) a
        else Partial(a.n + b.n,
          a.s.zip(b.s).map { case (x, y) => x + y },
          a.g.zip(b.g).map { case (x, y) => x + y }))
    require(merged.n > 0, "PCA fit on empty input")
    val d = merged.s.length
    val n = merged.n
    val mean = merged.s.map(_ / n)
    // covariance (population): C = G/n - mean meanᵀ
    val c = Array.ofDim[Double](d, d)
    var t = 0
    for (i <- 0 until d; j <- i until d) {
      val v = merged.g(t) / n - mean(i) * mean(j)
      c(i)(j) = v; c(j)(i) = v; t += 1
    }
    val (vals, vecs) = jacobiEigen(c)
    PcaModel(d, n, mean, vals, vecs)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: rotations zero
    * each off-diagonal pair per sweep until convergence. Returns
    * (eigenvalues desc, eigenvectors sign-normalized). */
  def jacobiEigen(cIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = cIn.length
    val a = cIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgnT = if (theta >= 0) 1.0 else -1.0
            val tTan = sgnT / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cCos = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val sSin = tTan * cCos
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cCos * akp - sSin * akq
              a(k)(q) = sSin * akp + cCos * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cCos * apk - sSin * aqk
              a(q)(k) = sSin * apk + cCos * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cCos * vkp - sSin * vkq
              v(k)(q) = sSin * vkp + cCos * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort desc by eigenvalue (tie: original index), sign-normalize
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project onto the top-k components: broadcast-literal eigenvector
    * arrays, per-row zip_with folds — shuffle-free. Adds proj_1..k. */
  def project(vectors: DataFrame, vecCol: String, model: PcaModel,
      k: Int): DataFrame = {
    val mu = typedlit(model.mean.toSeq)
    (1 to k).foldLeft(vectors) { (df, j) =>
      val vj = typedlit(model.eigvecs(j - 1).toSeq)
      df.withColumn(s"proj_$j",
        aggregate(
          zip_with(
            zip_with(transform(col(vecCol), x => x.cast("double")), mu,
              (x, m) => x - m),
            vj, (cent, w) => cent * w),
          lit(0.0), (acc, x) => acc + x))
    }
  }

  /** Hash-checkable diagnostics (the q242 body): exact columns
    * (n, covariance trace via order-free exact-decimal sums) +
    * tolerance verdicts over the eigen structure. One row per
    * component. */
  def diagnostics(vectors: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = vectors.sparkSession
    val model = fit(vectors, vecCol)
    // exact trace path: per-dim decimal sums (order-free)
    val dims = vectors
      .select(posexplode(col(vecCol)).as(Seq("i", "vf")))
      .select(col("i"), col("vf").cast("double").as("x"))
    val per = dims.groupBy(col("i")).agg(
      sum(round(col("x"), 10).cast("decimal(28,10)")).as("s1"),
      sum(round(col("x") * col("x"), 10).cast("decimal(28,10)")).as("s2"),
      count(lit(1)).as("n"))
    val trace = per.select(
        round(col("s2").cast("double") / col("n")
          - (col("s1").cast("double") / col("n"))
            * (col("s1").cast("double") / col("n")), 8)
          .cast("decimal(28,8)").as("vd"),
        col("n"))
      .agg(sum(col("vd")).cast("double").as("trace"), max(col("n")).as("n"))
    // tolerance verdicts
    val d = model.dim
    val orthonormal = {
      var worst = 0.0
      for (a <- 0 until d; b <- a until d) {
        var dot = 0.0; var i = 0
        while (i < d) { dot += model.eigvecs(a)(i) * model.eigvecs(b)(i); i += 1 }
        val target = if (a == b) 1.0 else 0.0
        worst = math.max(worst, math.abs(dot - target))
      }
      worst < 1e-8
    }
    val descending = model.eigvals.sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1) - 1e-12)
    val eigSum = model.eigvals.sum // Σλ = trace (checked vs exact trace)
    val projected = project(vectors, vecCol, model, k)
    val projChecks = (1 to k).map { j =>
      val r = projected.agg(
        avg(col(s"proj_$j")).as("m"),
        var_pop(col(s"proj_$j")).as("v")).head
      val m = r.getDouble(0); val vr = r.getDouble(1)
      val lam = model.eigvals(j - 1)
      (math.abs(m) < 1e-7,
        math.abs(vr - lam) <= 1e-6 * math.max(1e-12, math.abs(lam)) + 1e-9)
    }
    val projMeanZero = projChecks.forall(_._1)
    val projVarOk = projChecks.forall(_._2)
    import spark.implicits._
    val comps = spark.range(1, k + 1)
      .select(col("id").cast("int").as("component"))
    comps.crossJoin(trace)
      .select(col("component"),
        col("n").as("n_vectors"),
        round(col("trace"), 6).as("cov_trace"),
        lit(orthonormal).as("orthonormal"),
        lit(descending).as("eig_descending"),
        (abs(col("trace") - lit(eigSum)) <=
          lit(1e-6) * greatest(lit(1.0), abs(col("trace"))))
          .as("eigsum_matches_trace"),
        lit(projVarOk).as("proj_var_matches_eigval"),
        lit(projMeanZero).as("proj_mean_zero"))
      .orderBy(col("component"))
  }
}
