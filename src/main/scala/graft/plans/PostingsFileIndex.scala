package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.PostingsManifest

/** The postings artifact's [[ManifestFileIndex]]: scan planning for a
  * [[graft.operators.Similarity.readPostings]] snapshot comes entirely
  * from the [[PostingsManifest]] — file list, byte sizes, and `cell`
  * partition values — so serving performs **zero filesystem listings**
  * and `cell` predicates prune to the probed cells' FILES (not even
  * their directories).
  *
  * Built over the manifest's LIVE entries only: files a retained op
  * superseded stay on disk for older snapshots but are invisible to
  * new ones. A snapshot survives an overlapped
  * [[graft.operators.Similarity.compactIvfPostingsRetained]] (it
  * retires superseded files instead of deleting them — the Delta
  * tombstone move); the overwrite-style maintenance ops delete what
  * they replace, so under them the snapshot is only valid between
  * serving epochs. See [[ManifestFileIndex]] for the generic seam's
  * contract (snapshot immutability, by-name pruning binds, exact byte
  * lengths).
  */
final class PostingsFileIndex(basePath: String,
    state: PostingsManifest.State)
  extends ManifestFileIndex(
    new Path(basePath),
    StructType(Seq(StructField("cell", IntegerType, nullable = true))),
    PostingsFileIndex.groupsOf(new Path(basePath), state))

private object PostingsFileIndex {
  /** One group per cell over the manifest's live entries, sorted for a
    * deterministic plan. */
  def groupsOf(root: Path, state: PostingsManifest.State)
      : Seq[(InternalRow, Seq[(Path, Long)])] =
    state.live.groupBy(_.cell).toSeq.sortBy(_._1).map { case (cell, fs) =>
      (InternalRow(cell),
        fs.map(e =>
          (new Path(new Path(root, s"cell=$cell"), e.file), e.bytes)))
    }
}
