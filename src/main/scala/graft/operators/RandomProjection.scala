package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorNative

/** Johnson–Lindenstrauss random projection — the dimensionality-side
  * half of similarity search at 100 TB, beside [[Quantization]]'s
  * precision-side half: a 64-dim embedding projects to `outDim` (16 by
  * default) dims, cutting index memory AND every downstream distance
  * computation 4×, while the JL lemma bounds pairwise-distance
  * distortion (Johnson & Lindenstrauss 1984; database-style dense
  * projections per Achlioptas 2001 — public knowledge).
  *
  * The projection matrix reuses [[Similarity.hyperplanes]]'s portable
  * plane family (`w(j,d) = md5Hash60("graft:plane:j:d")/2⁶⁰·2−1`,
  * prefix-stable in both j and d): uniform[-1,1) entries have variance
  * 1/3, so the variance-unbiased row scale is `√(3/outDim)` — making
  * `E‖y‖² = ‖x‖²` exactly, which the per-vector `norm_ratio` output
  * certifies in-band. Because the planes are the SAME deterministic
  * constants an ANSI engine can recompute, every projected component
  * replays bit-identically in the DuckDB oracle (the established
  * `list_dot_product` parity: one sequential fold per component on
  * identical IEEE inputs), so even this "randomized" operator gets an
  * exact hash oracle via integer micro-unit floors.
  *
  * Shape: pure projection — the matrix is `outDim` array literals
  * embedded at plan-build time, the per-row work is `outDim` codegen'd
  * dot products, no shuffle, no state. At 100 TB this runs entirely
  * map-side inside the scan stage; the one tiny eager job is the
  * dimensionality probe (first non-null vector), same as the LSH/IVF
  * builders. Null or dimension-mismatched vectors yield null
  * components (DotProduct's documented semantics) rather than erroring.
  */
object RandomProjection {

  /** Projected vector as `array<double>` of length `outDim`:
    * y_j = dot(w_j, x) · √(3/outDim), w from the portable plane family. */
  def project(vec: Column, outDim: Int, dim: Int): Column = {
    require(outDim > 0 && dim > 0, s"outDim=$outDim dim=$dim must be positive")
    val planes = Similarity.hyperplanes(outDim, dim)
    // one multiply AFTER the dot (not folded into the weights) so the
    // oracle's `list_dot_product(v, pw) * sqrt(3.0/m)` is the same
    // IEEE operation sequence
    val scale = lit(math.sqrt(3.0 / outDim.toDouble))
    array(planes.map(w => VectorNative.dot(vec, typedLit(w)) * scale): _*)
  }

  /** Attach `proj` (array<double>, length `outDim`) and `norm_ratio`
    * (‖y‖²/‖x‖², double — E[·]=1 under the unbiased scale; null for
    * zero vectors AND for dimension-mismatched vectors, whose proj
    * components are all null — the null-component guard keeps DotProduct
    * off null element slots, which its contract does not cover) to an
    * embedding frame. `dim` ≤ 0 probes the width from the first
    * non-null vector ([[Similarity.dimOf]]). */
  def withProjection(df: DataFrame, vec: Column, outDim: Int, dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else dimOf(df, vec)
    val sq = VectorNative.dot(vec, vec)
    df.withColumn("proj", project(vec, outDim, d))
      // proj components are null all-together (one shared length
      // mismatch), so testing the first suffices
      .withColumn("norm_ratio",
        when(sq > 0d && col("proj").getItem(0).isNotNull,
          VectorNative.dot(col("proj"), col("proj")) / sq))
  }

  /** Vector width from the first non-null, non-empty vector — shared
    * probe with the LSH/IVF builders ([[Similarity.dimOf]]). */
  private def dimOf(df: DataFrame, vec: Column): Int = {
    val tmp = df.select(vec.as("_v"))
    Similarity.dimOf(tmp, "_v")
  }
}
