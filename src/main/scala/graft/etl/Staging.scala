package graft.etl

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Remote fetch-to-staging (reference C9: SFTP ingestion,
  * `etl-sftp/src/lib.rs:28-65` — connect, pull files, then decode locally).
  *
  * Spark-native form: every remote scheme is a Hadoop `FileSystem` —
  * `file://`, `hdfs://`, `s3a://`, and `sftp://user:pw@host/path` via
  * Hadoop's built-in `org.apache.hadoop.fs.sftp.SFTPFileSystem` (present in
  * hadoop-client-api; it needs the `jsch` jar on the cluster classpath,
  * which this offline container does not ship, so tests exercise the same
  * code path over `file://` URIs). Credentials ride the URI or
  * `fs.sftp.*` Hadoop conf keys — the reference's user/password and ssh-key
  * options map onto `fs.sftp.user.{host}` / `fs.sftp.password.{host}` /
  * `fs.sftp.key.file.{host}`.
  *
  * `fetch` copies each matched remote file into a staging directory on the
  * driver-visible FS and returns the staged paths, ready for
  * `TextSource.lines` / `ErrorTolerant.csvFiles` — small control-plane
  * copies; bulk data should land on an object store and be read directly.
  */
object Staging {

  /** Copy remote files (glob + optional regex filter, C8 semantics) into
    * `stagingDir`; returns the staged file paths.
    */
  def fetch(spark: SparkSession, sources: Seq[String], stagingDir: String,
      regex: Option[String] = None): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(stagingDir)
    val dstFs = dst.getFileSystem(conf)
    dstFs.mkdirs(dst)
    for {
      glob <- sources
      uri <- FileListing.list(spark, glob, regex)
    } yield {
      val src = new Path(uri)
      val srcFs = src.getFileSystem(conf)
      val out = new Path(dst, src.getName)
      FileUtil.copy(srcFs, src, dstFs, out, false, true, conf)
      out.toString
    }
  }

  /** Fetch + read as lines with lineage — the reference's "sftp source"
    * composed end-to-end: remote pull, then the standard decode path.
    */
  def fetchLines(spark: SparkSession, sources: Seq[String], stagingDir: String,
      regex: Option[String] = None): org.apache.spark.sql.DataFrame =
    TextSource.lines(spark, fetch(spark, sources, stagingDir, regex))
}
