package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CPU-dense per-row stages.
  *
  * Optimization-guide §2.5's "input skew" case: a small unsplittable
  * parquet file (one row group) scans as ONE task no matter how many
  * cores the session has, and when the per-row work downstream of that
  * scan is expensive — tokenize + shingle + distinct over documents,
  * vector arithmetic over embeddings — the whole stage serializes on
  * one core (measured: the q20 shingle pass at 5.5 s single-task on a
  * 32-core session, ~0.3 s spread). The fix is the guide's own:
  * "repartition immediately after the read" — made conditional so it
  * is a LOCAL-UNDERPARALLELIZATION remedy, not a tuned constant:
  *
  *  - target = `sparkContext.defaultParallelism`, which follows the
  *    cluster (local[n] → n; a real cluster → total cores), never a
  *    hard-coded number;
  *  - the exchange is added ONLY when the frame's planned partition
  *    count is below the target. At production scale the scan already
  *    carries ≥ parallelism splits and the call is the identity — no
  *    shuffle, no plan change, nothing to tune off.
  */
object Spread {

  /** Round-robin `df` across `defaultParallelism` partitions iff it is
    * currently planned below that — identity otherwise. Apply BEFORE a
    * CPU-expensive projection whose input is (or may be) a single
    * small-file scan. Row-level semantics are untouched: consumers are
    * joins/aggregations/set ops, all order-insensitive. */
  def cpuBound(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // rdd.getNumPartitions plans (no job): scan splits for a file read
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
