package graft.index

import org.apache.spark.sql.SparkSession

/** spark-submit entry #3: index maintenance.
  *
  * {{{
  * spark-submit --class graft.index.AdminJob <jar> \
  *   --index <index root> \
  *   (--delete-query "terms" | --purge | --compact | --snapshot DIR | --restore DIR)
  * }}}
  *
  * `--delete-query` tombstones every doc matching any of the analyzed terms
  * (ES `_delete_by_query`; soft — stats and postings untouched, queries
  * exclude immediately). `--purge` is the expunge merge
  * ([[Deletes.purge]]). `--compact` is the segment merge
  * ([[Compaction.compact]]). `--snapshot DIR` copies the currently-resolved
  * artifact generations + fingerprint manifest; `--restore DIR` publishes
  * them back atomically ([[Snapshots]]). Operations run in the given order, so
  * `--delete-query "..." --purge` is delete-and-expunge in one submit.
  */
object AdminJob {

  def main(argv: Array[String]): Unit = {
    var index = ""
    val ops = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--index" => index = argv(i + 1); i += 2
        case "--delete-query" => ops += (("delete", argv(i + 1))); i += 2
        case "--purge" => ops += (("purge", "")); i += 1
        case "--compact" => ops += (("compact", "")); i += 1
        case "--snapshot" => ops += (("snapshot", argv(i + 1))); i += 2
        case "--restore" => ops += (("restore", argv(i + 1))); i += 2
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
    }
    require(index.nonEmpty, "--index is required")
    require(ops.nonEmpty, "nothing to do: pass --delete-query/--purge/--compact")

    val b = SparkSession.builder().appName("graft-index-admin")
    if (!sys.props.contains("spark.master")) b.master("local[*]")
    val spark = b.config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.foreach {
      case ("delete", q) =>
        val n = Deletes.deleteByQuery(spark, index, q.split("\\s+").toSeq.filter(_.nonEmpty))
        println(s"""{"op":"delete_by_query","tombstones":$n}""")
      case ("purge", _) =>
        Deletes.purge(spark, index)
        println(s"""{"op":"purge","done":true}""")
      case ("compact", _) =>
        Compaction.compact(spark, index)
        println(s"""{"op":"compact","done":true}""")
      case ("snapshot", dir) =>
        val fps = Snapshots.create(spark, index, dir)
        println(s"""{"op":"snapshot","dir":"$dir","artifacts":${fps.size}}""")
      case ("restore", dir) =>
        Snapshots.restore(spark, dir, index)
        println(s"""{"op":"restore","dir":"$dir","done":true}""")
    }
    spark.stop()
  }
}
