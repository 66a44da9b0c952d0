package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The FLAT-artifact manifest sidecar — [[PostingsManifest]]'s shape
  * applied to un-partitioned directory artifacts (the exact-hash and
  * winnow indexes today; any single-directory parquet artifact a
  * family adopts next): one tiny driver-written text file
  * (`<artifact>/_manifest`, invisible to readers — Spark skips
  * `_`-prefixed paths) recording the artifact's family tag, its
  * embedded parameters as key→value strings, and every data file with
  * exact bytes + footer row counts.
  *
  * What it buys, same as the postings family: serve-time planning with
  * ZERO filesystem listings ([[readFlat]] plans the scan from a
  * [[graft.plans.ManifestFileIndex]] snapshot — a
  * `spark.read.parquet(dir)` lists every file before the first task,
  * the measured serving term as file counts grow), params without a
  * footer read, and file-count/row observability (`State.files`) that
  * makes LSM append debt visible instead of silent. Appends stage into
  * a sibling temp dir and RENAME in (never a listing of the standing
  * artifact), so every maintenance op stays ∝ its own batch.
  *
  * Protocol is [[MaintenanceProtocol]]'s verbatim: the `_manifest_dirty`
  * write-ahead flag (absent ⟹ manifest ≡ directory truth; stranded ⟹
  * consumers degrade to their listing fallbacks and the next compaction
  * rebuilds), and the sibling writer lease (single-writer maintenance,
  * fail-fast on a second writer). Flat artifacts carry no retention/
  * tombstone machinery — their compactions are overwrite-style swaps
  * ([[graft.sources.WarehouseWriter.compactParquet]]'s durable-swap
  * discipline), so there is nothing to retire.
  *
  * Reference analogue: the warehouse's reliance on DB catalogs instead
  * of directory walks (init-user-db.sh:119-120), the same move Delta
  * Lake/Iceberg make with their transaction logs.
  */
object ArtifactManifest {

  /** One data file at the artifact root: exact physical `bytes` (the
    * parquet reader seeks its footer at length − 8) and footer `rows`. */
  case class FileEntry(file: String, bytes: Long, rows: Long)

  case class State(family: String, params: Map[String, String],
      files: Seq[FileEntry]) {
    def totalFiles: Int = files.size
    def totalRows: Long = files.map(_.rows).sum
    def totalBytes: Long = files.map(_.bytes).sum
    def adding(entries: Seq[FileEntry]): State =
      copy(files = files ++ entries)
  }

  private val FormatHeader = "graft-artifact-manifest\t1"

  def manifestPath(path: String): Path =
    new Path(path.stripSuffix("/"), "_manifest")

  def fsOf(spark: SparkSession, path: String): FileSystem =
    MaintenanceProtocol.fsOf(spark, path)

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(manifestPath(path))

  def isDirty(spark: SparkSession, path: String): Boolean =
    MaintenanceProtocol.isDirty(spark, path)

  def markDirty(spark: SparkSession, path: String): Unit =
    MaintenanceProtocol.markDirty(spark, path)

  def clearDirty(spark: SparkSession, path: String): Unit =
    MaintenanceProtocol.clearDirty(spark, path)

  def withLease[A](spark: SparkSession, path: String, op: String)(
      body: => A): A =
    MaintenanceProtocol.withLease(spark, path, op)(body)

  /** The manifest iff trustworthy: present AND not dirty, with the
    * same malformed-shape policy as the postings sidecar — truncated
    * (fewer than header+family) or zero file lines degrade to None
    * (the consumer's listing fallback serves truth; planning zero
    * files would serve EMPTY results), a garbled line throws
    * (tmp+rename makes partial writes impossible — a bad line is a
    * bug, not a crash window). An artifact whose family tag differs
    * from `family` returns None too: a consumer must never plan one
    * family's scan from another's sidecar (a copied/moved directory). */
  def readClean(spark: SparkSession, path: String,
      family: String): Option[State] = {
    val fs = fsOf(spark, path)
    val dest = manifestPath(path)
    if (MaintenanceProtocol.isDirty(spark, path) || !fs.exists(dest)) None
    else if (fs.getFileStatus(dest).isDirectory) None
    else {
      val in = fs.open(dest)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      if (lines.length < 3) None // header + family + at least one file
      else if (lines.head != FormatHeader) {
        // a POSTINGS manifest (or a future v2) under a flat reader:
        // degrade, same policy as PostingsManifest's v1 handling
        None
      } else {
        val fam = lines(1).split('\t')
        require(fam.length == 2 && fam(0) == "family",
          s"malformed manifest family line at $dest: '${lines(1)}'")
        if (fam(1) != family) None
        else {
          val (paramLines, fileLines) =
            lines.drop(2).partition(_.startsWith("param\t"))
          if (fileLines.isEmpty) None
          else {
            val params = paramLines.map { l =>
              val p = l.split('\t')
              require(p.length == 3,
                s"malformed manifest param line at $dest: '$l'")
              p(1) -> p(2)
            }.toMap
            val files = fileLines.map { l =>
              val f = l.split('\t')
              require(f.length == 4 && f(0) == "file",
                s"malformed manifest file line at $dest: '$l'")
              FileEntry(f(1), f(2).toLong, f(3).toLong)
            }
            Some(State(family, params, files))
          }
        }
      }
    }
  }

  /** Persist with the tmp+rename swap (readers between delete and
    * rename degrade to their listing fallback, never to a wrong
    * manifest); driver-side FS write, no Spark job. Caller owns the
    * dirty-flag ordering. */
  def write(spark: SparkSession, path: String, state: State): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new Path(path.stripSuffix("/"),
      "_manifest.tmp-" + java.util.UUID.randomUUID().toString)
    try {
      val out = fs.create(tmp, true)
      try {
        val w = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(out, "UTF-8"))
        def enc(s: String): String = {
          require(!s.contains('\t') && !s.contains('\n'),
            s"unencodable manifest token: '$s'")
          s
        }
        w.write(FormatHeader); w.newLine()
        w.write(s"family\t${enc(state.family)}"); w.newLine()
        state.params.toSeq.sortBy(_._1).foreach { case (k, v) =>
          w.write(s"param\t${enc(k)}\t${enc(v)}"); w.newLine()
        }
        state.files.foreach { f =>
          w.write(Seq("file", enc(f.file), f.bytes, f.rows)
            .mkString("\t")); w.newLine()
        }
        w.flush()
      } finally out.close()
      val dest = manifestPath(path)
      fs.delete(dest, true)
      require(fs.rename(tmp, dest), s"manifest swap failed: $tmp -> $dest")
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw e
    }
  }

  /** Directory truth for a FLAT artifact — one root listing plus one
    * footer-bounded row-count job (no data pages); `family`/`params`
    * come from the caller (the rebuild must not trust the manifest it
    * replaces). Sweeps manifest tmp files stranded by a crash, like
    * the postings rebuild. */
  def rebuild(spark: SparkSession, path: String, family: String,
      params: Map[String, String]): State = {
    val fs = fsOf(spark, path)
    val root = new Path(path.stripSuffix("/"))
    val listing = fs.listStatus(root)
    listing
      .filter(s => s.isFile && s.getPath.getName.startsWith("_manifest.tmp-"))
      .foreach(s => fs.delete(s.getPath, false))
    val parts = listing
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    require(parts.nonEmpty,
      s"no data files under $path — build the artifact first")
    val rowsByPath = org.apache.spark.sql.GraftColumnBridge
      .parquetFooterRowCounts(spark, parts.map(_.getPath.toString).toSeq)
    State(family, params,
      parts.toSeq.map(f => FileEntry(f.getPath.getName, f.getLen,
        rowsByPath.getOrElse(f.getPath.toString, 0L))))
  }

  def rebuildAndWrite(spark: SparkSession, path: String, family: String,
      params: Map[String, String]): State = {
    val s = rebuild(spark, path, family, params)
    write(spark, path, s)
    clearDirty(spark, path)
    s
  }

  /** Best-effort family tag of whatever manifest sits at `path` —
    * read even when DIRTY: the dirty flag marks the FILE LIST stale,
    * but an artifact's family never changes over its life and
    * tmp+rename means the file is never half-written, so the tag is
    * authoritative whenever it parses. None = no parseable flat
    * manifest (absent, legacy layout, foreign format). */
  def familyOf(spark: SparkSession, path: String): Option[String] = {
    val fs = fsOf(spark, path)
    val dest = manifestPath(path)
    try {
      if (!fs.exists(dest) || fs.getFileStatus(dest).isDirectory) None
      else {
        val in = fs.open(dest)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().take(2).toVector
          finally in.close()
        if (lines.length == 2 && lines(0) == FormatHeader &&
            lines(1).startsWith("family\t"))
          Some(lines(1).split('\t')(1))
        else None
      }
    } catch { case _: Throwable => None }
  }

  /** Fail fast when the artifact's manifest names a DIFFERENT family
    * than the caller expects — a copied/mispointed directory must
    * error loudly, never be scanned under a foreign schema (which
    * would serve all-null key columns and, e.g., declare every
    * screened doc novel). Unknown/absent manifests pass: the caller's
    * discovering fallback resolves real columns by name and fails
    * loudly on a genuine mismatch. */
  def requireFamilyOrUnknown(spark: SparkSession, path: String,
      family: String): Unit =
    familyOf(spark, path).foreach { f =>
      if (f != family) throw new IllegalStateException(
        s"artifact at $path is family '$f', not '$family' — refusing " +
          "to read it as the wrong artifact kind")
    }

  /** Open a flat artifact for serving: with a clean manifest the scan
    * is planned from a [[graft.plans.ManifestFileIndex]] snapshot —
    * zero listings, exact byte sizes for the optimizer, pushed-down
    * data filters reaching the parquet row groups exactly as on a
    * discovered read. Falls back to the DISCOVERING
    * `spark.read.parquet` for manifest-less or dirty artifacts (flat
    * families have no tombstones, so the listing IS truth there) —
    * schema-less deliberately, so a genuinely foreign directory fails
    * at column resolution instead of serving typed nulls; a PRESENT
    * manifest of another family throws before any scan. */
  def readFlat(spark: SparkSession, path: String, family: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    readClean(spark, path, family) match {
      case Some(st) =>
        val root = new Path(path.stripSuffix("/"))
        org.apache.spark.sql.GraftColumnBridge.parquetOverFileIndex(spark,
          new graft.plans.ManifestFileIndex(root,
            new org.apache.spark.sql.types.StructType(),
            Seq((org.apache.spark.sql.catalyst.InternalRow.empty,
              st.files.map(f => (new Path(root, f.file), f.bytes))))),
          schema)
      case None =>
        requireFamilyOrUnknown(spark, path, family)
        spark.catalog.refreshByPath(path)
        spark.read.parquet(path)
    }

  /** The staged-append PROTOCOL, shared by every flat family (one
    * place to fix — the exact/minhash/winnow appends previously each
    * hand-rolled it): under the writer lease, read the in-lease state,
    * build the delta writer from it (`mkWrite` receives the state so
    * params cost no second manifest read), then either plain-append
    * for a legacy manifest-less artifact or run the dirty-bracketed
    * stage-and-rename roll-forward. Ends with a catalog refresh:
    * [[stageIntoRoot]]'s raw FS renames bypass Spark's
    * FileStatusCache invalidation (the old `mode("append")` writes
    * invalidated it), and a DISCOVERING reader — or a later
    * compaction's `spark.read.parquet` — planning from a stale cached
    * listing would silently miss the appended files. */
  def appendStaged(spark: SparkSession, path: String, family: String)(
      mkWrite: Option[State] => String => Unit): Unit =
    withLease(spark, path, "delta_append") {
      val state0 = readClean(spark, path, family)
      if (state0.isEmpty) requireFamilyOrUnknown(spark, path, family)
      val writeDelta = mkWrite(state0)
      state0 match {
        case None => writeDelta(path)
        case Some(st) =>
          markDirty(spark, path)
          val entries = stageIntoRoot(spark, path)(writeDelta)
          write(spark, path, st.adding(entries))
          clearDirty(spark, path)
      }
      spark.catalog.refreshByPath(path)
    }

  /** Land `writeTmp`'s output files INSIDE the flat artifact without
    * listing it: the caller writes the delta to the supplied fresh
    * sibling staging dir (nothing to list there), then each part-file
    * is renamed into the artifact root — FS metadata ops ∝ the batch's
    * own file count, nothing ∝ the artifact. Part-file names carry the
    * write job's UUID, so renames cannot collide. Returns the landed
    * entries (bytes from the staging listing, rows from one
    * footer-bounded job over just the staged files). */
  def stageIntoRoot(spark: SparkSession, path: String)(
      writeTmp: String => Unit): Seq[FileEntry] = {
    val tmp = path.stripSuffix("/") +
      "__delta_" + java.util.UUID.randomUUID().toString
    val hTmp = new Path(tmp)
    val fs = fsOf(spark, path)
    try {
      writeTmp(tmp)
      val staged = fs.listStatus(hTmp)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      val rowsByPath = org.apache.spark.sql.GraftColumnBridge
        .parquetFooterRowCounts(spark, staged.map(_.getPath.toString).toSeq)
      val root = new Path(path.stripSuffix("/"))
      staged.toSeq.map { f =>
        val name = f.getPath.getName
        require(fs.rename(f.getPath, new Path(root, name)),
          s"staging rename failed: ${f.getPath} -> $root")
        FileEntry(name, f.getLen,
          rowsByPath.getOrElse(f.getPath.toString, 0L))
      }
    } finally fs.delete(hTmp, true)
  }

  /** Delete orphaned staging siblings (`<artifact>__delta_*`) stranded
    * by a driver crash mid-append — swept at compaction, the artifact's
    * exclusive-maintenance window. Shared by the flat families AND the
    * postings family (one implementation of the sweep, per this
    * object's no-re-deriving stance). */
  def sweepStaleDeltas(fs: FileSystem, artifactRoot: Path): Int = {
    val parent = artifactRoot.getParent
    if (parent == null) 0
    else {
      val prefix = artifactRoot.getName + "__delta_"
      val stale = fs.listStatus(parent)
        .filter(d => d.isDirectory && d.getPath.getName.startsWith(prefix))
      stale.foreach(d => fs.delete(d.getPath, true))
      stale.length
    }
  }

  def sweepStaleDeltas(spark: SparkSession, path: String): Int =
    sweepStaleDeltas(fsOf(spark, path), new Path(path.stripSuffix("/")))
}
