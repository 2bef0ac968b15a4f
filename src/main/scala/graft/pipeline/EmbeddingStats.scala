package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorMoments.vec_moments

/** Corpus-level embedding statistics — mean, covariance, PCA basis, and
  * (whitened) projection. This is the preprocessing stack in front of
  * every dense-retrieval / clustering / semantic-dedup stage: PCA
  * dimension reduction before IVF/LSH (smaller codes, better cells),
  * whitening before cosine (dominant directions stop swamping the
  * metric), and the covariance spectrum itself as a corpus-drift
  * diagnostic (eigenvalue collapse = embedding degeneration).
  *
  * Distribution contract: the ONLY corpus-sized work is the one-pass
  * [[org.apache.spark.sql.graft.VectorMomentsAgg vec_moments]]
  * aggregate (d²/2 fixed-point sums per map task, partial-aggregated —
  * one d²-sized row crosses the wire per partition). Everything
  * downstream — the d×d eigensolve, the basis — is driver-side on d²
  * doubles (d ≤ ~4096 embeddings: microseconds), and the projection is
  * a map-side per-row matrix multiply against a broadcast basis. The
  * corpus never shuffles.
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY
  * §2.5); the reference library has no embedding-statistics surface.
  */
object EmbeddingStats {

  /** Upper-triangle covariance in long format `(i, j, sxy, cov,
    * cov_micro)` with `sxy = Σ floor(x_i·x_j·10^s + 0.5)` (the
    * order-independent fixed-point second moment — see `vec_moments`),
    * `cov = sxy/(n·10^s) − (sx/(n·10^s))·(sy/(n·10^s))` rounded 6 dp
    * (both moments return to their natural units before subtracting),
    * and `cov_micro = floor(cov_raw·10⁶ + 0.5)` — the SAME quantity as
    * an exact BIGINT in micro-units. All inputs to the double formula
    * are integers, so two engines cannot disagree on a ulp — but a
    * rounded DOUBLE can still diverge at the sign-of-zero level (−0.0
    * vs +0.0 hash differently even though they compare equal), which is
    * why cross-engine gates must compare `cov_micro`, never `cov`.
    * `dim` must match the data: the aggregate throws on ragged vectors,
    * and a plan-level guard raises when the packed moments length
    * disagrees with `dim` (a smaller `dim` would otherwise read
    * misaligned triangle slots and return silently wrong covariances).
    * Null vectors are skipped.
    */
  def covariance(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scaleDigits: Int = 6): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tri = dim * (dim + 1) / 2
    val scale = math.pow(10.0, scaleDigits)
    val agg = df.agg(vec_moments(col(vecCol), scaleDigits).as("m0"))
      // guard: the packed array length is tri+dim+1 iff the caller's dim
      // matches the data's true dimension (null = no non-null vectors —
      // that degenerate case passes through as null rows, not an error)
      .select(
        when(col("m0").isNull || size(col("m0")) === lit(tri + dim + 1), col("m0"))
          .otherwise(raise_error(concat(
            lit(s"covariance: dim=$dim expects ${tri + dim + 1} packed moments, got "),
            size(col("m0")).cast("string"),
            lit(" — dim does not match the data's vector dimension"))))
          .as("m"))
    // single-row fan-out to the d(d+1)/2 matrix entries; the packed
    // array rides along (one row, vocabulary-free — cost is nil)
    val n = element_at(col("m"), tri + dim + 1)
    val k = col("i") * dim - col("i") * (col("i") - 1) / 2 + (col("j") - col("i"))
    val sx = element_at(col("m"), (lit(tri) + col("i") + 1).cast("int"))
    val sy = element_at(col("m"), (lit(tri) + col("j") + 1).cast("int"))
    val sxy = element_at(col("m"), (k + 1).cast("int"))
    val covRaw =
      sxy.cast("double") / n / lit(scale) -
        (sx.cast("double") / n / lit(scale)) *
          (sy.cast("double") / n / lit(scale))
    agg
      .select(col("m"), explode(sequence(lit(0L), lit(dim - 1L))).as("i"))
      .select(col("m"), col("i"), explode(sequence(col("i"), lit(dim - 1L))).as("j"))
      .select(col("i"), col("j"), sxy.as("sxy"),
        round(covRaw, 6).as("cov"),
        floor(covRaw * lit(scale) + lit(0.5)).cast("long").as("cov_micro"))
  }

  /** A fitted PCA basis: `mean` (length d), `eigvals` descending,
    * `components(r)` = the r-th principal axis (length d, unit norm,
    * sign fixed so the largest-magnitude entry is positive).
    */
  case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigvals: Array[Double],
      components: Array[Array[Double]])

  /** Fit a PCA basis from the one-pass moments: covariance assembled
    * driver-side from the fixed-point sums, eigendecomposed with cyclic
    * Jacobi (deterministic — no randomized init), eigenpairs sorted by
    * eigenvalue descending (tie: original index), signs canonicalized.
    * One Spark job; the corpus is scanned once.
    */
  def fitPca(df: DataFrame, vecCol: String, dim: Int, scaleDigits: Int = 6): PcaModel =
    fitPcaFull(df, vecCol, dim, scaleDigits)._1

  /** [[fitPca]] plus the snapped covariance matrix it diagonalized —
    * the d×d driver-side array assembled from the same fixed-point
    * moments [[covariance]] pins, so a caller (the `p_embedding_pca`
    * gate) can verify `C·v_r = λ_r·v_r` against the EXACT matrix the
    * eigensolve saw, not a re-derivation that could drift.
    */
  def fitPcaFull(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scaleDigits: Int = 6): (PcaModel, Array[Array[Double]]) = {
    require(dim > 0, s"dim must be positive, got $dim")
    val tri = dim * (dim + 1) / 2
    val scale = math.pow(10.0, scaleDigits)
    val row = df.agg(vec_moments(col(vecCol), scaleDigits)).head()
    require(!row.isNullAt(0), "fitPca: no non-null vectors in input")
    val m = row.getSeq[Long](0).toArray
    require(m.length == tri + dim + 1,
      s"fitPca: dim=$dim expects ${tri + dim + 1} moments, got ${m.length}")
    val n = m(tri + dim)
    val mean = Array.tabulate(dim)(i => m(tri + i) / scale / n)
    val cov = Array.ofDim[Double](dim, dim)
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = m(k) / scale / n - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
      k += 1
    }
    val (vals, vecs) = jacobiEig(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i))
    val eigvals = order.map(vals).toArray
    val components = order.map { c =>
      val v = Array.tabulate(dim)(r => vecs(r)(c))
      // canonical sign: largest-|entry| positive (first such on ties)
      val piv = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(piv) < 0) v.map(x => -x) else v
    }.toArray
    (PcaModel(n, mean, eigvals, components), cov)
  }

  /** Project (and optionally whiten) embeddings onto the top `k` axes:
    * `y_r = v_rᵀ(x − μ)`, divided by `sqrt(λ_r)` when `whiten` (axes
    * with λ ≤ 0 — numerically empty directions — emit 0 rather than
    * Inf). Map-side per-row multiply against the broadcast basis; the
    * UDF is marked nondeterministic ONLY to pin its projection below
    * any later join (the PQ-encode lesson: Catalyst happily duplicates
    * expensive deterministic UDFs across join fan-out).
    */
  def project(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      k: Int,
      whiten: Boolean = false,
      outCol: String = "proj"): DataFrame = {
    require(k > 0 && k <= model.eigvals.length,
      s"k must be in [1, ${model.eigvals.length}], got $k")
    val mean = model.mean
    val comps = model.components.take(k)
    val invStd =
      if (!whiten) Array.fill(k)(1.0)
      else model.eigvals.take(k).map(l => if (l > 0) 1.0 / math.sqrt(l) else 0.0)
    val proj = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val x = v.toArray
        require(x.length == mean.length,
          s"project: expected dim ${mean.length}, got ${x.length}")
        val y = new Array[Double](comps.length)
        var r = 0
        while (r < comps.length) {
          val c = comps(r)
          var s = 0.0
          var i = 0
          while (i < x.length) { s += c(i) * (x(i) - mean(i)); i += 1 }
          y(r) = s * invStd(r)
          r += 1
        }
        y
      }
    }.asNondeterministic()
    df.withColumn(outCol, proj(col(vecCol).cast("array<double>")))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * `(eigenvalues, eigenvectors)` with eigenvector c in column c.
    * Deterministic sweep order, converges quadratically; sweeps are
    * capped and convergence asserted (a non-symmetric input is the only
    * way to miss it).
    */
  private[pipeline] def jacobiEig(
      matrix: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = matrix.length
    val a = Array.tabulate(d, d)((i, j) => matrix(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      math.sqrt(2 * s)
    }
    var sweep = 0
    val maxSweeps = 100
    while (offNorm() > 1e-12 && sweep < maxSweeps) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // theta = 0 (equal diagonal) wants the full 45-degree rotation,
        // t = 1 — signum(0) = 0 would silently skip it
        val t =
          if (theta == 0.0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweep += 1
    }
    require(offNorm() <= 1e-8,
      s"jacobiEig did not converge in $maxSweeps sweeps (off-norm ${offNorm()})")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
