package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** O2–O5 — storage hygiene over any Hadoop filesystem, replacing the
  * reference's local-disk cleanup (`util/cleanup.py`): age-based retention
  * (7-day staging / 30-day processed defaults, `cleanup.py:13`,
  * `main.py:405`) and size-cap eviction (20 GB cap, evict oldest-first to 90%,
  * `cleanup.py:12,117`).
  */
object Retention {

  val DefaultCapBytes: Long = 20L * 1024 * 1024 * 1024
  val EvictToFraction: Double = 0.9

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** O3 — recursive size of a directory. */
  def folderSize(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (f.exists(p)) f.getContentSummary(p).getLength else 0L
  }

  /** O4 — delete files older than maxAgeDays. Returns deleted paths. */
  def cleanupOldFiles(spark: SparkSession, dir: String, maxAgeDays: Int = 7): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Nil
    val cutoff = System.currentTimeMillis() - maxAgeDays.toLong * 86400L * 1000L
    f.listStatus(p).toSeq
      .filter(s => s.isFile && s.getModificationTime < cutoff)
      .map { s => f.delete(s.getPath, false); s.getPath.toString }
  }

  /** O5 — if the directory exceeds capBytes, delete oldest files first until
    * usage ≤ 90% of the cap (the reference's mtime-ascending eviction,
    * `cleanup.py:81-128`).
    */
  def enforceSizeCap(spark: SparkSession, dir: String, capBytes: Long = DefaultCapBytes): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Nil
    var total = f.getContentSummary(p).getLength
    if (total <= capBytes) return Nil
    val targetBytes = (capBytes * EvictToFraction).toLong
    val byAge = f.listStatus(p).toSeq.filter(_.isFile).sortBy(_.getModificationTime)
    val deleted = Seq.newBuilder[String]
    for (s <- byAge if total > targetBytes) {
      f.delete(s.getPath, false)
      total -= s.getLen
      deleted += s.getPath.toString
    }
    deleted.result()
  }
}
