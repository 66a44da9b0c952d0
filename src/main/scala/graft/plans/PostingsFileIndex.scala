package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.PostingsManifest

/** A [[FileIndex]] planned entirely from a [[PostingsManifest]] — the
  * move Delta Lake/Iceberg make with their transaction logs, applied to
  * the postings artifact: the scan's file list, sizes, and partition
  * values all come from the manifest snapshot, so planning a serve
  * performs **zero filesystem listings** (`spark.read.parquet(dir)` on
  * a partitioned artifact must list EVERY file before the first task —
  * §6.2 measured that full-scan listing dominating bounded-query
  * serving at 10⁴⁺ cells, and it recurs on every query because the
  * relation cache keys on paths it must re-verify).
  *
  * Partition pruning works exactly as on a discovered index: Catalyst
  * hands `cell`-column predicates to [[listFiles]], which evaluates
  * them against each cell's value — a `$"cell".isin(probed)` filter
  * reads only probed cells' FILES (not even their directories).
  *
  * The index is an immutable SNAPSHOT of the manifest at construction —
  * maintenance that runs after it is built is invisible until the
  * caller re-reads ([[graft.operators.Similarity.readPostings]]). A
  * snapshot survives an overlapped
  * [[graft.operators.Similarity.compactIvfPostingsRetained]] (it
  * retires superseded files instead of deleting them — the Delta
  * tombstone move); the overwrite-style maintenance ops delete what
  * they replace, so under them the snapshot is only valid between
  * serving epochs. `sizeInBytes` feeds the optimizer's broadcast
  * decision the manifest's exact live byte total.
  */
final class PostingsFileIndex(
    basePath: String,
    state: PostingsManifest.State) extends FileIndex {

  private val root = new Path(basePath)

  override val partitionSchema: StructType =
    StructType(Seq(StructField("cell", IntegerType, nullable = true)))

  /** One PartitionDirectory per cell, built once over the manifest's
    * LIVE entries (files a retained compaction superseded stay on disk
    * for older snapshots but are invisible to new ones): FileStatus
    * carries the manifest's exact byte length (the parquet reader seeks
    * the footer at length − 8, so this must be — and is — the length
    * the write-time listing recorded). */
  private val partitions: Seq[PartitionDirectory] =
    state.live.groupBy(_.cell).toSeq.sortBy(_._1).map { case (cell, fs) =>
      PartitionDirectory(
        InternalRow(cell),
        fs.map { e =>
          FileStatusWithMetadata(new FileStatus(
            e.bytes, false, 1, 128L << 20, 0L,
            new Path(new Path(root, s"cell=$cell"), e.file)))
        })
    }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) partitions
    else {
      // the same bind-and-evaluate Spark's own discovered indexes use:
      // cell is the only partition column, so every attribute binds to
      // ordinal 0 of the partition-values row
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case _: AttributeReference =>
            BoundReference(0, IntegerType, nullable = true)
        })
      bound.initialize(0)
      partitions.filter(p => bound.eval(p.values))
    }

  override def inputFiles: Array[String] =
    partitions.flatMap(_.files.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = state.live.map(_.bytes).sum

  override def toString: String =
    s"PostingsFileIndex($basePath, ${state.live.size} files, " +
      s"${partitions.size} cells)"
}
