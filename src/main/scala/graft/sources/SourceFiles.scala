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
    * `_`/`.`-prefixed side files invisible. */
  def listDataFiles(fs: FileSystem, dir: Path): Seq[(String, Long)] = {
    if (!fs.exists(dir)) return Seq.empty
    val st = fs.getFileStatus(dir)
    if (st.isFile) return Seq((st.getPath.toString, st.getLen))
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen))
  }
}
