package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Shared plumbing for the file-format connectors: option parsing,
  * data-file listing, and Hadoop-configuration propagation. The
  * connectors must resolve filesystems from the SESSION's Hadoop
  * configuration (spark.hadoop.* — object-store credentials, endpoints,
  * fs.defaultFS), captured on the driver and shipped to readers/writers
  * as a [[SerializableConfiguration]]; a blank `new Configuration()`
  * works on a laptop and fails on exactly the cluster deployments the
  * connectors exist for. */
private[sources] object SourceFiles {

  def pathOf(props: Map[String, String], format: String): String =
    props.getOrElse("path", throw new IllegalArgumentException(
      s"$format source requires a path (.load(path) / .save(path))"))

  /** The active session's Hadoop conf, wrapped for executor shipping.
    * Called on the DRIVER (scan/write construction time). */
  def hadoopConf(): SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())

  def fs(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)

  /** Data files under `dir`, sorted by FILE NAME (load-bearing: the warc
    * stream's offset is the highest processed name) — non-recursive,
    * `_`/`.`-prefixed side files invisible. Delegates to the mtime
    * variant so the two can never diverge on the visibility/sort
    * contract. */
  def listDataFiles(fs: FileSystem, dir: Path): Seq[(String, Long)] =
    listDataFilesWithMtime(fs, dir).map { case (f, len, _) => (f, len) }

  /** [[listDataFiles]] plus each file's modification time — the warc
    * stream's late-file diagnostic needs to distinguish "landed before
    * this run started" from "producer violated the offset contract". */
  def listDataFilesWithMtime(fs: FileSystem, dir: Path): Seq[(String, Long, Long)] = {
    if (!fs.exists(dir)) return Seq.empty
    val st = fs.getFileStatus(dir)
    if (st.isFile) return Seq((st.getPath.toString, st.getLen, st.getModificationTime))
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && visible(s.getPath))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
  }

  private def visible(p: Path): Boolean =
    !p.getName.startsWith("_") && !p.getName.startsWith(".")

  /** Recursive variant for nested corpus layouts (Common Crawl's
    * `segments/N/warc/....warc.gz`), sorted by FULL PATH. Hidden
    * (`_`/`.`) files and directories are invisible at every level. */
  def listDataFilesRecursive(fs: FileSystem, dir: Path): Seq[(String, Long)] = {
    if (!fs.exists(dir)) return Seq.empty
    val st = fs.getFileStatus(dir)
    if (st.isFile) return Seq((st.getPath.toString, st.getLen))
    val out = Seq.newBuilder[(String, Long)]
    def walk(d: Path): Unit =
      fs.listStatus(d).foreach { s =>
        if (visible(s.getPath)) {
          if (s.isFile) out += ((s.getPath.toString, s.getLen))
          else walk(s.getPath)
        }
      }
    walk(dir)
    out.result().sortBy(_._1)
  }

  /** Batch-scan listing with LOUD diagnostics for the two silent-zero
    * traps: a missing path, and a nested layout read without
    * `recursive` (pointing `format("warc")` at a Common Crawl root
    * would otherwise return an empty frame and look like clean data). */
  def listForBatch(fs: FileSystem, dir: Path, recursive: Boolean,
                   format: String): Seq[(String, Long)] = {
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$format source: path does not exist: $dir")
    val files =
      if (recursive) listDataFilesRecursive(fs, dir)
      else listDataFiles(fs, dir)
    if (files.isEmpty && !recursive && !fs.getFileStatus(dir).isFile) {
      val subdirs = fs.listStatus(dir).count(s => s.isDirectory && visible(s.getPath))
      if (subdirs > 0) throw new IllegalArgumentException(
        s"$format source: $dir holds no data files but $subdirs " +
          "subdirectories — a nested corpus layout needs " +
          ".option(\"recursive\", \"true\")")
    }
    files
  }

  def recursiveOpt(props: Map[String, String], format: String): Boolean =
    props.get("recursive") match {
      case None => false
      case Some(v) if v.equalsIgnoreCase("true") => true
      case Some(v) if v.equalsIgnoreCase("false") => false
      case Some(other) => throw new IllegalArgumentException(
        s"$format source: recursive must be 'true' or 'false', got '$other'")
    }
}
