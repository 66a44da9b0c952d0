package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The postings artifact's MANIFEST SIDECAR — a tiny driver-written
  * text file inside the artifact (`<artifact>/_manifest`, invisible to
  * readers: Spark's partition discovery skips `_`-prefixed paths)
  * recording every data file: `(cell, file, bytes, rows)` plus the
  * embedded artifact parameters. Storage is one tab-separated file
  * written and parsed DRIVER-SIDE through the Hadoop FS API — the
  * Delta-log shape (JSON text actions, no Spark job): a manifest
  * roll-forward must not cost a cluster job, because it rides EVERY
  * maintenance op and its payload is file-level metadata the driver
  * already holds. (The first cut stored it as a one-task parquet
  * write; that Spark job was pure fixed overhead per append —
  * measured at fixture scale as the dominant term of q79's wall.) It exists to kill the engine's last
  * artifact-metadata-proportional costs: before it, every compaction
  * LISTED the whole artifact (183 s over 67 918 files at the r14
  * trickle posture — §6.1), every full-scan serve re-listed every cell
  * directory, and the param read still listed the root. With a clean
  * manifest, params are one small read, compaction folds only the cells
  * the manifest marks fragmented, and serving plans its scan from the
  * manifest alone ([[graft.plans.PostingsFileIndex]]) — ZERO directory
  * listings, the same move Delta Lake/Iceberg make with their
  * transaction logs (reference analogue: the warehouse's reliance on DB
  * catalogs, init-user-db.sh:119-120).
  *
  * Consistency protocol — `_manifest_dirty`, a write-ahead intent flag:
  * every maintenance op marks dirty BEFORE its first artifact mutation
  * and clears it only after the manifest is rolled forward to match.
  * Invariant: **flag absent ⟹ manifest ≡ directory truth** (spec-pinned
  * through build / fragment append / replay / recap append / compact).
  * A crash mid-maintenance strands the flag; readers then fall back to
  * directory listings ([[readClean]] returns None) and the next
  * compaction rebuilds the manifest from truth and clears the flag.
  * Same single-writer stance as the maintenance ops themselves.
  *
  * Scale: manifest size is ∝ data FILES (cells + uncompacted
  * fragments), never rows — 10⁵ entries of ~5 numbers is a
  * driver-trivial single-digit-MB read, which is exactly why file-level
  * state can live driver-side while row-level state never does.
  */
object PostingsManifest {

  /** One data file of the artifact: `file` is the part-file name inside
    * `cell=<cell>/`; `rows` its physical row count (replay duplicates
    * included — the manifest records truth, not post-dedup logic).
    * `retired` marks a file a RETAINED compaction superseded but left
    * on disk for in-flight snapshot readers (the Delta tombstone move):
    * still physically present (the truth invariant covers it), no
    * longer part of the live artifact, deleted by the next retained
    * compaction's vacuum. */
  case class FileEntry(cell: Int, file: String, bytes: Long, rows: Long,
      retired: Boolean = false)

  /** The artifact's embedded constants (same values every data row
    * carries as iv_ columns). */
  case class Params(cells: Int, cap: Int, ck: Long, gp: Option[Int])

  case class State(params: Params, files: Seq[FileEntry]) {
    /** The serving artifact: every consumer (reads, population stats,
      * fragmented detection) reasons over LIVE entries; retired files
      * exist only for snapshot readers that planned before the
      * compaction that retired them. */
    def live: Seq[FileEntry] = files.filterNot(_.retired)
    def perCellFiles: Map[Int, Int] =
      live.groupBy(_.cell).view.mapValues(_.size).toMap
    def perCellRows: Map[Int, Long] =
      live.groupBy(_.cell).view.mapValues(_.map(_.rows).sum).toMap
    def totalFiles: Int = live.size
    /** Replace every entry of `cells` with `entries` (the post-rewrite
      * truth for those cells) — the roll-forward all overwrite-style
      * maintenance shares. Retired entries of those cells drop too: the
      * dynamic partition overwrite that triggers this replaced the
      * whole cell DIRECTORY, retired files included (an overwrite-style
      * op ends any retention window for the cells it touches). */
    def replacingCells(cells: Set[Int], entries: Seq[FileEntry]): State =
      copy(files = files.filterNot(f => cells(f.cell)) ++ entries)
    /** Add fragment entries (one new file per touched cell). */
    def adding(entries: Seq[FileEntry]): State =
      copy(files = files ++ entries)
    /** The retained-compaction roll-forward: `folded` cells' live
      * entries become retired (files stay on disk for in-flight
      * snapshots), `entries` are their compacted replacements. */
    def retiringCells(folded: Set[Int], entries: Seq[FileEntry]): State =
      copy(files = files.map(f =>
        if (!f.retired && folded(f.cell)) f.copy(retired = true) else f)
        ++ entries)
  }

  def manifestDir(path: String): Path =
    new Path(path.stripSuffix("/"), "_manifest")
  private def dirtyFlag(path: String): Path =
    new Path(path.stripSuffix("/"), "_manifest_dirty")

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(manifestDir(path))

  def isDirty(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(dirtyFlag(path))

  /** Write-ahead intent: call BEFORE the first artifact mutation of a
    * maintenance op. One create on the artifact's filesystem. */
  def markDirty(spark: SparkSession, path: String): Unit =
    fsOf(spark, path).create(dirtyFlag(path), true).close()

  def clearDirty(spark: SparkSession, path: String): Unit =
    fsOf(spark, path).delete(dirtyFlag(path), false)

  private val FormatHeader = "graft-postings-manifest\t2"

  /** The manifest iff it is trustworthy: present AND not dirty. Every
    * consumer goes through here — a stranded dirty flag silently
    * degrades consumers to their listing fallbacks instead of serving
    * them a manifest that may omit files a half-finished append already
    * renamed in. A v1 (parquet-directory) manifest from an older build
    * also returns None — its artifact re-adopts through the same
    * rebuild path a manifest-less one does. A MALFORMED v2 file throws:
    * tmp+rename makes partial writes impossible, so malformed means a
    * bug, not a crash window. */
  def readClean(spark: SparkSession, path: String): Option[State] = {
    val fs = fsOf(spark, path)
    val dest = manifestDir(path)
    if (fs.exists(dirtyFlag(path)) || !fs.exists(dest)) None
    else if (fs.getFileStatus(dest).isDirectory) None // legacy v1 layout
    else {
      val in = fs.open(dest)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      if (lines.isEmpty) None
      else {
        require(lines.head == FormatHeader,
          s"unrecognized manifest header at $dest: '${lines.head}'")
        val p = lines(1).split('\t')
        require(p.length == 5 && p(0) == "params",
          s"malformed manifest params line at $dest: '${lines(1)}'")
        val gp = if (p(4) == "-") None else Some(p(4).toInt)
        val files = lines.drop(2).map { l =>
          val f = l.split('\t')
          require(f.length == 6 && f(0) == "file",
            s"malformed manifest file line at $dest: '$l'")
          FileEntry(f(1).toInt, f(2), f(3).toLong, f(4).toLong,
            f(5) == "1")
        }
        Some(State(Params(p(1).toInt, p(2).toInt, p(3).toLong, gp), files))
      }
    }
  }

  /** Persist `state` with a tmp-file + rename swap (the brief
    * no-manifest window between delete and rename degrades readers to
    * their listing fallback, never to a wrong manifest). Driver-side
    * FS write — no Spark job rides the maintenance path. Does NOT
    * touch the dirty flag — the caller owns the protocol ordering. */
  def write(spark: SparkSession, path: String, state: State): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new Path(path.stripSuffix("/"),
      "_manifest.tmp-" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"))
      w.write(FormatHeader); w.newLine()
      w.write(Seq("params", state.params.cells, state.params.cap,
        state.params.ck, state.params.gp.map(_.toString).getOrElse("-"))
        .mkString("\t")); w.newLine()
      state.files.foreach { f =>
        require(!f.file.contains('\t') && !f.file.contains('\n'),
          s"unencodable file name in manifest: '${f.file}'")
        w.write(Seq("file", f.cell, f.file, f.bytes, f.rows,
          if (f.retired) "1" else "0").mkString("\t")); w.newLine()
      }
      w.flush()
    } finally out.close()
    val dest = manifestDir(path)
    fs.delete(dest, true) // recursive: also clears a legacy v1 directory
    require(fs.rename(tmp, dest), s"manifest swap failed: $tmp -> $dest")
  }

  /** Directory truth, the O(files) fallback the manifest exists to make
    * rare: one recursive listing for names/bytes plus one zero-data-
    * parallelized footer job for per-file row counts (no data pages,
    * no per-file reader initialization). Params
    * come from one part-file footer, NOT from the manifest (this is
    * what REBUILDS the manifest, so it must not trust it). */
  private def stage[A](name: String)(body: => A): A = {
    if (!sys.env.contains("GRAFT_MAINT_TIMING")) body
    else {
      val t0 = System.nanoTime()
      val a = body
      System.err.println(
        f"[maint]   $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
  }

  def rebuild(spark: SparkSession, path: String): State = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val root = new Path(path)
    val listed = stage("rebuild_list")(fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("cell="))
      .flatMap { d =>
        val cell = d.getPath.getName.stripPrefix("cell=").toInt
        fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .map(f => (cell, f.getPath.getName, f.getLen))
      })
    require(listed.nonEmpty,
      s"no postings data under $path — build with saveIvfPostings first")
    // Per-file row counts come from parquet FOOTERS via one
    // parallelized job ([[org.apache.spark.sql.GraftColumnBridge
    // .parquetFooterRowCounts]]) — a DataFrame
    // groupBy(input_file_name).count() paid ~10 ms of full reader
    // initialization per file (23.6 s of a 74 s build over 15.5 k
    // files, §6.1 r15); the footer job does the identical accounting
    // in ~1 s. No data pages are read either way.
    val byPath = stage("rebuild_counts") {
      org.apache.spark.sql.GraftColumnBridge.parquetFooterRowCounts(
        spark,
        listed.map { case (c, name, _) =>
          new Path(new Path(root, s"cell=$c"), name).toString
        }.toSeq)
    }
    val perFileRows = listed.map { case (c, name, _) =>
      (c, name) ->
        byPath(new Path(new Path(root, s"cell=$c"), name).toString)
    }.toMap
    val one = new Path(new Path(root, s"cell=${listed.head._1}"),
      listed.head._2)
    val head = stage("rebuild_params")(spark.read.parquet(one.toString))
    val hr = head.select(col("iv_cells"), col("iv_cap"), col("iv_ck")).take(1)
    require(hr.nonEmpty, s"unreadable postings part-file: $one")
    val gp =
      if (head.columns.contains("iv_gp"))
        Some(head.select(col("iv_gp")).take(1)(0).getInt(0))
      else None
    State(
      Params(hr(0).getInt(0), hr(0).getInt(1), hr(0).getLong(2), gp),
      listed.toSeq.map { case (c, name, bytes) =>
        FileEntry(c, name, bytes, perFileRows.getOrElse((c, name), 0L))
      })
  }

  /** Rebuild from truth, persist, clear any stranded dirty flag — the
    * recovery step (and the adoption step for a manifest-less
    * artifact). */
  def rebuildAndWrite(spark: SparkSession, path: String): State = {
    val s = rebuild(spark, path)
    write(spark, path, s)
    clearDirty(spark, path)
    s
  }

  /** List `cells`' directories (∝ touched, never ∝ artifact) into
    * per-file entries with the given per-cell row counts — the
    * post-overwrite bookkeeping for maintenance that just rewrote those
    * cells to one file each. */
  def entriesFromDirs(spark: SparkSession, path: String, cells: Set[Int],
      rowsPerCell: Map[Int, Long]): Seq[FileEntry] = {
    val fs = fsOf(spark, path)
    cells.toSeq.flatMap { c =>
      val d = new Path(path.stripSuffix("/"), s"cell=$c")
      if (!fs.exists(d)) Seq.empty
      else fs.listStatus(d)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .map(f => FileEntry(c, f.getPath.getName, f.getLen,
          rowsPerCell.getOrElse(c, 0L)))
    }
  }
}
