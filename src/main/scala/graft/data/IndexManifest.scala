package graft.data

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-consistent reads for every MAINTAINED index (dedup cells,
  * MinHash bands, IVF cells, TF-IDF postings): a versioned MANIFEST pins
  * the exact file set a reader plans against, and every mutation
  * (append, compaction, artifact rewrite) becomes visible only through
  * ONE atomic commit — so a serve planned at any point during a
  * mutation sees exactly the pre-state or exactly the post-state, never
  * the union a directory listing could observe mid-swap.
  *
  * Layout under an index root:
  *
  *   shard=0/part-....parquet      data files (any single-level
  *   cell=7/part-....parquet       partition layout)
  *   _manifests/m000000000001      manifest versions (text, see below)
  *   _art/name/v000001/            artifact versions (bounded model
  *                                 tables: centroids, df, stats, ...)
  *
  * A manifest lists relative data-file paths (`D <path>`) and the
  * current version directory of each named artifact (`A <name> <dir>`).
  * The CURRENT manifest is simply the highest version present — commits
  * create a new file under a temp name and `rename` it into place
  * (rename-into-fresh-name is the atomic primitive on HDFS and local
  * filesystems alike), so a manifest either exists completely or not at
  * all; there is no pointer file to torn-write.
  *
  * The maintenance protocol every mutator follows:
  *
  *   1. [[reconcile]]: delete any data file or artifact version the
  *      current manifest does not reference — the debris of a crashed
  *      mutation (its files were never committed, so no reader ever saw
  *      them). Adopts a directory-listing manifest for pre-manifest
  *      index dirs (one-time migration).
  *   2. Read the pre-state through [[readData]]/[[readArtifact]]
  *      (pinned to the current manifest).
  *   3. Write new data files (plain `mode("append")` into the partition
  *      layout) and/or new artifact versions ([[writeArtifact]] — a NEW
  *      directory per version, never an in-place overwrite, so no
  *      `refreshByPath` ever invalidates a reader's plan).
  *   4. [[commitListing]]/[[commit]]: publish the post-state.
  *
  * A crash anywhere before step 4 leaves the index EXACTLY at the
  * pre-state for every reader (the new files are invisible orphans);
  * a crash after step 4 leaves it exactly at the post-state (any
  * not-yet-deleted superseded files are orphans). This replaces the
  * round-11 two-marker compaction protocol — and extends the same
  * guarantee to appends and artifact updates, which previously relied
  * on write ordering alone (a crash between a postings append and its
  * df/N artifact rewrite left the artifacts silently stale; now the
  * two publish in one commit).
  *
  * Concurrency contract (unchanged from the appends themselves): ONE
  * writer in the maintainer's window; any number of readers at any
  * time. Retention is zero — a superseded file may be deleted while a
  * reader pinned to an older manifest is still EXECUTING (planning is
  * safe; execution races deletion) — production on object storage
  * would add a retention window before physical deletion, exactly like
  * table-format VACUUM, without changing any plan below.
  *
  * Scale: a manifest holds one line per data file — at 100 TB with
  * ~1 GB files that is ~10⁵ lines per index, a single small object
  * read once per query plan (table formats ship the same design; the
  * next step there, per-partition manifest segments, changes nothing
  * about the commit protocol).
  */
object IndexManifest {

  private val ManifestDir = "_manifests"
  private val ArtRoot = "_art"

  /** A pinned snapshot: data files (relative to the index root) and the
    * current version directory per artifact name. */
  final case class Snapshot(version: Long, dataFiles: Seq[String],
                            artifacts: Map[String, String])

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("m") && name.drop(1).forall(_.isDigit) &&
        name.length > 1)
      Some(name.drop(1).toLong)
    else None

  /** All data files under single-level `key=value` partition
    * directories, as root-relative paths, sorted. Hidden files and
    * directories (`_`/`.` prefixes) never count. */
  def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val (fs, root) = fsOf(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .flatMap { dir =>
        fs.listStatus(dir.getPath).toSeq.filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(st => s"${dir.getPath.getName}/${st.getPath.getName}")
      }.sorted
  }

  /** The current (highest-version) manifest, if any. */
  def load(spark: SparkSession, path: String): Option[Snapshot] = {
    val (fs, root) = fsOf(spark, path)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq
      .flatMap(st => versionOf(st.getPath.getName).map(_ -> st.getPath))
    if (versions.isEmpty) return None
    val (v, p) = versions.maxBy(_._1)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val data = lines.collect { case l if l.startsWith("D ") => l.drop(2) }
    val arts = lines.collect { case l if l.startsWith("A ") =>
      val rest = l.drop(2)
      val cut = rest.indexOf(' ')
      rest.take(cut) -> rest.drop(cut + 1)
    }.toMap
    Some(Snapshot(v, data, arts))
  }

  /** Publish a snapshot as the next manifest version: write to a
    * dot-prefixed temp name, then rename into place — the atomic
    * commit point of every mutation. Single-writer contract. */
  def commit(spark: SparkSession, path: String, dataFiles: Seq[String],
             artifacts: Map[String, String]): Long = {
    val (fs, root) = fsOf(spark, path)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val next = load(spark, path).map(_.version + 1).getOrElse(1L)
    val name = f"m$next%012d"
    val tmp = new Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try {
      val body = (dataFiles.sorted.map(f => s"D $f") ++
        artifacts.toSeq.sortBy(_._1).map { case (n, d) => s"A $n $d" })
        .mkString("\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    val dst = new Path(dir, name)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest commit failed: $tmp -> $dst")
    next
  }

  /** [[commit]] from the CURRENT directory listing, carrying the
    * previous manifest's artifact pointers (optionally overridden).
    * Correct only after [[reconcile]] in the same single-writer window
    * — the listing must hold no other mutation's orphans. */
  def commitListing(spark: SparkSession, path: String,
                    artifacts: Map[String, String] = Map.empty): Long = {
    val prev = load(spark, path).map(_.artifacts).getOrElse(Map.empty)
    commit(spark, path, listDataFiles(spark, path), prev ++ artifacts)
  }

  /** Crash repair + one-time adoption, run at the START of every
    * mutation: with a manifest present, delete every data file,
    * artifact version directory, and leftover `_compacting` temp the
    * manifest does not reference (debris of a crashed mutation — never
    * visible to any reader, safe to drop). Without one, adopt the
    * current listing as version 1 (pre-manifest index migration). */
  def reconcile(spark: SparkSession, path: String): Snapshot =
    load(spark, path) match {
      case None =>
        commit(spark, path, listDataFiles(spark, path), Map.empty)
        load(spark, path).get
      case Some(snap) =>
        val (fs, root) = fsOf(spark, path)
        val listed = listDataFiles(spark, path)
        val keep = snap.dataFiles.toSet
        listed.filterNot(keep).foreach { rel =>
          fs.delete(new Path(root, rel), false)
        }
        // leftover per-shard compaction temps (crashed mid-rewrite)
        fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          .foreach { dir =>
            val tmp = new Path(dir.getPath, "_compacting")
            if (fs.exists(tmp)) fs.delete(tmp, true): Unit
          }
        // artifact versions the manifest does not point at (either a
        // crashed mutation's uncommitted version, or a superseded one)
        val artDir = new Path(root, ArtRoot)
        if (fs.exists(artDir)) {
          val current = snap.artifacts.values.toSet
          fs.listStatus(artDir).toSeq.filter(_.isDirectory).foreach { fam =>
            fs.listStatus(fam.getPath).toSeq.filter(_.isDirectory)
              .foreach { v =>
                val rel = s"$ArtRoot/${fam.getPath.getName}/${v.getPath.getName}"
                if (!current(rel)) fs.delete(v.getPath, true): Unit
              }
          }
        }
        snap
    }

  /** The pinned data read: exactly the current manifest's files, with
    * the partition column recovered from the directory layout
    * (`basePath`) — same scan node, same partition pruning, same
    * broadcast shapes as a directory read; only the file LISTING is
    * pinned. Falls back to the directory listing for roots without a
    * manifest (externally-built fixtures). */
  def readData(spark: SparkSession, path: String): DataFrame =
    load(spark, path) match {
      case Some(snap) if snap.dataFiles.nonEmpty =>
        val (fs, root) = fsOf(spark, path)
        spark.read.option("basePath", root.toString)
          .parquet(snap.dataFiles.map(f => new Path(root, f).toString): _*)
      case _ => spark.read.parquet(path)
    }

  /** Write the next version of a named artifact (a NEW directory —
    * never an in-place overwrite) and return its manifest pointer.
    * Becomes visible only once a commit carries the pointer. */
  def writeArtifact(spark: SparkSession, path: String, name: String,
                    df: DataFrame): (String, String) = {
    val (fs, root) = fsOf(spark, path)
    val fam = new Path(root, s"$ArtRoot/$name")
    val next =
      if (!fs.exists(fam)) 1L
      else fs.listStatus(fam).toSeq
        .flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.length > 1)
            Some(n.drop(1).toLong)
          else None
        }.sorted.lastOption.map(_ + 1).getOrElse(1L)
    val rel = f"$ArtRoot/$name/v$next%06d"
    df.write.mode("overwrite").parquet(new Path(root, rel).toString)
    name -> rel
  }

  /** The pinned artifact read. `legacyDir` bridges pre-manifest index
    * layouts (e.g. a bare `_centroids` directory) so old fixtures stay
    * readable. */
  def readArtifact(spark: SparkSession, path: String, name: String,
                   legacyDir: Option[String] = None): DataFrame = {
    val ptr = load(spark, path).flatMap(_.artifacts.get(name))
    ptr match {
      case Some(rel) =>
        val (_, root) = fsOf(spark, path)
        spark.read.parquet(new Path(root, rel).toString)
      case None =>
        val dir = legacyDir.getOrElse(name)
        spark.read.parquet(s"$path/$dir")
    }
  }
}
