package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, diag}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame

/** Key-driver analysis — Johnson (2000) relative weights, the reference's
  * `key_driver_analysis.relative_importance` (ct_data.py:55-64,157-159).
  *
  * Distribution split: the O(N·k²) correlation accumulation runs in Spark
  * (`ml.stat.Correlation`, one pass over the data); the O(k³)
  * eigendecomposition of the k×k correlation matrix runs driver-side in
  * Breeze — k is feature-count-sized, never data-sized.
  *
  * Method: with predictor correlation matrix R = P Δ Pᵀ, the orthogonal
  * transform Λ = P Δ^{1/2} Pᵀ maps predictors to uncorrelated surrogates;
  * β = Λ⁻¹ r_xy are their regression weights, and the relative weight of
  * predictor j is ε_j = Σ_k λ²_jk β²_k. Σ ε_j = R² of the full model.
  */
object Kda {

  /** Returns (feature, relativeWeight) pairs; weights sum to model R². */
  def relativeWeights(df: DataFrame, target: String, features: Seq[String]): Seq[(String, Double)] = {
    val cols = features :+ target
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("_kda_vec")
      .transform(df.na.drop(cols)).select("_kda_vec")

    val corrAll: Matrix = Correlation.corr(assembled, "_kda_vec", "pearson")
      .head().getAs[Matrix](0)

    val k = features.size
    val r = DenseMatrix.tabulate(k, k)((i, j) => corrAll(i, j))
    val rxy = DenseVector.tabulate(k)(i => corrAll(i, k))

    val es = eigSym(r)
    // Λ = P Δ^{1/2} Pᵀ  (eigenvalues clamped at 0 for numerical safety)
    val sqrtVals = es.eigenvalues.map(v => math.sqrt(math.max(v, 0.0)))
    val lambda = es.eigenvectors * diag(sqrtVals) * es.eigenvectors.t
    val beta = lambda \ rxy

    val weights = (0 until k).map { j =>
      (0 until k).map(m => math.pow(lambda(j, m), 2) * math.pow(beta(m), 2)).sum
    }
    features.zip(weights)
  }
}
