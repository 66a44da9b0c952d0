package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference M6 — the vocabulary-file embedding feature
  * (ct_estimator.py:106-114, the commented-out `source` column): a
  * categorical looked up in a fixed vocabulary file (institutions.txt,
  * 1084 entries) and mapped to a dense `dimension=10` embedding that
  * feeds the DNN alongside the indicator columns.
  *
  * Spark-first re-expression, with the one semantic divergence stated
  * up front: TF's `embedding_column` is a TRAINABLE layer (its weights
  * move with the estimator's gradient); Spark's
  * `MultilayerPerceptronClassifier` cannot backpropagate into feature
  * columns, so the embedding here is a FIXED seeded projection — the
  * standard hashing-trick/random-projection substitute. What the
  * network can learn through its own hidden layers on top of a fixed
  * random projection is preserved; per-token fine-tuning is not. The
  * lookup semantics ARE matched exactly:
  *
  *  - the vocabulary is positional — index = line number in the file
  *    (`categorical_column_with_vocabulary_file` contract);
  *  - out-of-vocabulary values take `default_value = -1`, and an id of
  *    -1 embeds as the ZERO vector (TF's embedding lookup of the
  *    default id contributes zeros with the default combiner);
  *  - NULL behaves as OOV (the reference frame drops NULLs upstream,
  *    ct_data.py:47 dropna — here the zero vector makes the column
  *    total-function so callers need not pre-drop).
  *
  * Scale shape: vocab and matrix are DRIVER-SIDE literals (1084 × 10
  * doubles ≈ 87 KB) folded into the plan as `typedlit` maps/arrays —
  * broadcast once inside the task binary, probed per row by codegen'd
  * `element_at`, no join, no shuffle, no UDF. This is the right shape
  * up to ~10⁵-entry vocabularies; beyond that the lookup becomes a
  * broadcast JOIN against a vocab table (same semantics, one broadcast
  * exchange), which [[indexByJoin]] provides for parity.
  */
object VocabEmbedding {

  /** Read a vocabulary file: one term per line, index = line number
    * (0-based). Read through Hadoop FS so the path may live anywhere
    * the cluster sees; vocab files are small by contract (the
    * reference's is 1084 lines) and become plan literals, so this
    * driver-side read is the intended shape. */
  def loadVocab(spark: SparkSession, path: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      // keep interior blanks (they occupy vocab slots in TF's
      // line-number contract); drop only a trailing newline artifact
      val lines = src.getLines().toVector
      if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
    } finally in.close()
  }

  /** The seeded projection matrix: `vocab.size × dim` doubles in
    * [-0.5, 0.5), deterministic in (seed, position) — independent of
    * partitioning, session, or platform (single `java.util.Random`
    * stream consumed in row-major order). */
  def embeddingMatrix(vocabSize: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(vocabSize)(Array.fill(dim)(rnd.nextDouble() - 0.5))
  }

  /** Vocab index of `c` as a plan-literal map probe: in-vocab → line
    * number, OOV/NULL → -1 (the TF `default_value`). */
  def indexColumn(c: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty, "empty vocabulary")
    require(vocab.distinct.size == vocab.size,
      s"vocabulary has duplicate terms — positional lookup would be ambiguous")
    val m = typedlit(vocab.zipWithIndex.toMap)
    coalesce(element_at(m, c), lit(-1))
  }

  /** The same index via a broadcast join — the >10⁵-entry-vocab shape
    * where a plan-literal map stops being appropriate. Returns `df`
    * with `outCol` appended; row count and order contract identical to
    * [[indexColumn]] (left join, OOV/NULL → -1). Duplicate vocab terms
    * are rejected up front — a dup would duplicate every matching input
    * row, the silent row-fan [[indexColumn]] also refuses — and the
    * vocab columns join under internal aliases, so a caller whose `df`
    * already carries `term`/`idx` columns keeps them untouched.
    *
    * The duplicate probe is one EAGER job over the (small, broadcast-
    * sized) vocab at call time — correctness-first for the one-shot
    * shape. A per-micro-batch caller re-indexing against the SAME
    * already-validated vocab passes `checkDuplicates = false` to keep
    * the call purely plan-building (zero jobs until materialization). */
  def indexByJoin(spark: SparkSession, df: DataFrame, col: String,
      vocab: DataFrame, outCol: String,
      checkDuplicates: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col => fcol, count => fcount}
    // vocab: (term STRING, idx INT); broadcast — vocabularies are the
    // small side by definition, so the dup probe is one tiny job
    val v = vocab.select(vocab("term").as("__graft_vocab_term"),
      vocab("idx").as("__graft_vocab_idx"))
    if (checkDuplicates) {
      val dup = v.groupBy(fcol("__graft_vocab_term"))
        .agg(fcount(lit(1)).as("n")).filter(fcol("n") > 1).take(1)
      require(dup.isEmpty,
        s"vocabulary has duplicate terms (e.g. '${dup.headOption.map(_.getString(0)).getOrElse("")}') — " +
          "positional lookup would be ambiguous and the join would fan rows")
    }
    df.join(broadcast(v), df(col) === v("__graft_vocab_term"), "left_outer")
      .withColumn(outCol, coalesce(fcol("__graft_vocab_idx"), lit(-1)))
      .drop("__graft_vocab_term", "__graft_vocab_idx")
  }

  /** `<col>_emb`: the dense embedding as `array<double>` of length
    * `dim` — in-vocab rows take their matrix row, OOV/NULL the zero
    * vector. Pure expression tree (map probe + array-literal
    * `element_at`), codegen'd, no shuffle. */
  def embeddingColumn(c: Column, vocab: Seq[String], dim: Int,
      seed: Long = 42L): Column = {
    require(dim > 0, s"dim=$dim")
    val mat = embeddingMatrix(vocab.size, dim, seed)
    val matLit = typedlit(mat.map(_.toSeq).toSeq)
    val zeros = typedlit(Seq.fill(dim)(0.0))
    val idx = indexColumn(c, vocab)
    when(idx >= 0, element_at(matLit, idx + 1)).otherwise(zeros)
  }

  /** Append `<col>_emb` (as an ML `Vector`, assembler-ready) to `df`.
    * `VectorAssembler` takes vector columns but not raw arrays, so the
    * array expression is bridged with `array_to_vector` — still a
    * per-row expression, no UDF. */
  def withEmbedding(df: DataFrame, col: String, vocab: Seq[String],
      dim: Int = 10, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    df.withColumn(col + "_emb",
      array_to_vector(embeddingColumn(df(col), vocab, dim, seed)))
  }
}
