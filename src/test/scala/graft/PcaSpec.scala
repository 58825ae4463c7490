package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps

/** Distributed PCA: Jacobi eigensolver on a known spectrum, fit/
  * project invariants on real embeddings, q242 verdicts. */
class PcaSpec extends AnyFunSuite {
  import TestSession._

  test("jacobi recovers a known eigenstructure") {
    // A = R diag(5, 2) Rᵀ with R a 30° rotation
    val th = math.Pi / 6
    val (c, s) = (math.cos(th), math.sin(th))
    val a = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * c * s),
      Array((5 - 2) * c * s, 5 * s * s + 2 * c * c))
    val (vals, vecs) = PcaOps.jacobiEigen(a)
    assert(math.abs(vals(0) - 5.0) < 1e-12)
    assert(math.abs(vals(1) - 2.0) < 1e-12)
    // leading eigenvector = (cos θ, sin θ) up to sign normalization
    assert(math.abs(math.abs(vecs(0)(0)) - c) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(1)) - s) < 1e-12)
  }

  test("jacobi on a diagonal matrix is the identity decomposition") {
    val a = Array(
      Array(3.0, 0.0, 0.0), Array(0.0, 7.0, 0.0), Array(0.0, 0.0, 1.0))
    val (vals, vecs) = PcaOps.jacobiEigen(a)
    assert(vals.toSeq == Seq(7.0, 3.0, 1.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("fit: Σλ equals covariance trace; eigvals non-negative, desc") {
    val emb = Tables(spark, sfDir).embeddings
    val m = PcaOps.fit(emb, "embedding")
    assert(m.dim == 64 && m.n == 500)
    // trace from the model's own covariance diag == Σλ
    assert(m.eigvals.forall(_ >= -1e-10))
    assert(m.eigvals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // orthonormal basis
    for (i <- 0 until 4; j <- i until 4) {
      val dot = (0 until m.dim).map(k => m.eigvecs(i)(k) * m.eigvecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("projection variance matches eigenvalues; components uncorrelated") {
    val emb = Tables(spark, sfDir).embeddings
    val m = PcaOps.fit(emb, "embedding")
    val p = PcaOps.project(emb, "embedding", m, 3)
    val r = p.agg(
      var_pop(col("proj_1")).as("v1"), var_pop(col("proj_2")).as("v2"),
      covar_pop(col("proj_1"), col("proj_2")).as("c12"),
      avg(col("proj_1")).as("m1")).head
    assert(math.abs(r.getDouble(0) - m.eigvals(0)) < 1e-6 * m.eigvals(0) + 1e-9)
    assert(math.abs(r.getDouble(1) - m.eigvals(1)) < 1e-6 * m.eigvals(1) + 1e-9)
    assert(math.abs(r.getDouble(2)) < 1e-7)
    assert(math.abs(r.getDouble(3)) < 1e-7)
  }

  test("q242 verdicts are all true at sf0.001") {
    val df = SparkEntry.queries("q242_pca")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 4)
    for (r <- rows; f <- Seq("orthonormal", "eig_descending",
        "eigsum_matches_trace", "proj_var_matches_eigval",
        "proj_mean_zero")) {
      assert(r.getAs[Boolean](f), s"verdict $f false")
    }
  }
}
