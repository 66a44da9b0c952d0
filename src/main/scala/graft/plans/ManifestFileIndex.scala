package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** The reusable MANIFEST-READ seam: a [[FileIndex]] planned entirely
  * from caller-supplied file metadata — the move Delta Lake/Iceberg
  * make with their transaction logs, factored out of the postings
  * artifact so any manifest-carrying artifact family (the winnow /
  * band / bloom / exact-hash indexes, when they adopt sidecars) gets
  * zero-listing scan planning without re-deriving the plumbing
  * ([[PostingsFileIndex]] is the postings instantiation).
  *
  * The caller hands over one group per partition value: the partition
  * row (empty for FLAT artifacts — single group, no partition columns)
  * and that group's files as (path, bytes). Planning a scan then
  * performs ZERO filesystem listings: `spark.read.parquet(dir)` must
  * list every file before the first task (measured dominating
  * bounded-query serving at 10⁴⁺ directories, SURVEY §6.2), while this
  * index answers from the metadata the manifest already holds.
  *
  * Partition pruning works exactly as on a discovered index:
  * predicates over `partitionSchema`'s columns are bound BY NAME to
  * ordinals of the group rows and evaluated per group — a
  * `$"cell".isin(probed)` filter reads only probed groups' FILES (not
  * even their directories). Multi-column partition schemas bind the
  * same way (each attribute resolves to its own ordinal).
  *
  * The index is an immutable SNAPSHOT of the metadata at construction —
  * maintenance committed after it is built is invisible until the
  * caller re-reads. Byte lengths must be the files' exact physical
  * sizes (the parquet reader seeks its footer at length − 8), which is
  * what every manifest records from the write-time listing.
  * `sizeInBytes` feeds the optimizer's broadcast decision the exact
  * byte total.
  */
class ManifestFileIndex(
    root: Path,
    override val partitionSchema: StructType,
    groups: Seq[(InternalRow, Seq[(Path, Long)])]) extends FileIndex {

  private val partitions: Seq[PartitionDirectory] =
    groups.map { case (values, files) =>
      PartitionDirectory(
        values,
        files.map { case (p, bytes) =>
          FileStatusWithMetadata(
            new FileStatus(bytes, false, 1, 128L << 20, 0L, p))
        })
    }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) partitions
    else {
      // the same bind-and-evaluate Spark's own discovered indexes use:
      // each partition-column attribute binds by NAME to its ordinal
      // in the group rows
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val ord = partitionSchema.fieldIndex(a.name)
            BoundReference(ord, partitionSchema(ord).dataType,
              nullable = true)
        })
      bound.initialize(0)
      partitions.filter(p => bound.eval(p.values))
    }

  override def inputFiles: Array[String] =
    partitions.flatMap(_.files.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long =
    groups.flatMap(_._2.map(_._2)).sum

  override def toString: String =
    s"${getClass.getSimpleName}($root, " +
      s"${partitions.map(_.files.size).sum} files, " +
      s"${partitions.size} groups)"
}
