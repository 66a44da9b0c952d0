package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the version-audit station for a corpus that
  * arrives as periodic dumps (the reference's cadence: a fresh AACT
  * archive every month, `docker/aact/Dockerfile:20-22`; each restore
  * replaces the previous snapshot wholesale, so "what changed?" has no
  * answer inside the reference — this operator is that answer). Per id:
  * `added` (new side only), `removed` (old side only), `changed`
  * (both, content hash differs), `unchanged`.
  *
  * Scale shape: ONE full-outer equi-join on the id — with both
  * snapshots in the bucketed layout (`WarehouseWriter.saveBucketed`,
  * S10) the join co-locates and plans shuffle-free; otherwise it is a
  * single hash shuffle per side. Content comparison is by md5 of the
  * content column, computed per row during the scan, so each side is
  * read exactly once; a pipeline that stores the hash in the snapshot
  * (the `exactHashIndex` artifact already does) can pass that column as
  * `contentHash` and skip re-hashing the text entirely.
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` by `idCol`, comparing `contentHash`
    * (any deterministic per-row expression over each frame's columns).
    * `carry` names columns to pass through to the report (new side
    * wins; old side supplies them for removed rows). Returns one row
    * per id in either snapshot: `(idCol, status, carry*)`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id",
      contentHash: Column = md5(col("text")),
      carry: Seq[String] = Nil): DataFrame = {
    val o = oldDf.select(
      col(idCol).as("_o_id") +: contentHash.as("_o_hash") +:
        carry.map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select(
      col(idCol).as("_n_id") +: contentHash.as("_n_hash") +:
        carry.map(c => col(c).as(s"_n_$c")): _*)
    o.join(n, col("_o_id") === col("_n_id"), "full_outer")
      .select(
        coalesce(col("_n_id"), col("_o_id")).as(idCol) +:
          when(col("_o_id").isNull, "added")
            .when(col("_n_id").isNull, "removed")
            // null-SAFE inequality: a null hash (null content on one
          // side) must read as changed, not fall through to unchanged
          .when(!(col("_o_hash") <=> col("_n_hash")), "changed")
            .otherwise("unchanged").as("status") +:
          carry.map(c => coalesce(col(s"_n_$c"), col(s"_o_$c")).as(c)): _*)
  }
}
