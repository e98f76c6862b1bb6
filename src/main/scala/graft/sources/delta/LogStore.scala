package graft.sources.delta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The two atomic primitives the from-scratch Delta log requires of its
  * storage, extracted behind an interface — the same seam upstream
  * delta.io carves as its LogStore API (`io.delta.storage.LogStore`),
  * which exists because object stores lack an atomic create-if-absent:
  * S3 needs an external CAS/coordination service, while local, HDFS and
  * ABFS provide the atomicity natively (the reference writes its Delta
  * tables to MinIO — `spark/SaveDelta.scala:27-38` — exactly the
  * deployment that needs this seam).
  *
  *  - [[putIfAbsent]] is the COMMIT primitive: version file v lands
  *    exactly-once; of two racing writers one wins and one observably
  *    loses (returns false, re-reads the snapshot, retries at v+1).
  *  - [[overwrite]] is the POINTER primitive (`_last_checkpoint`):
  *    replace the body so readers never parse a torn prefix.
  *
  * Select an implementation per session with
  * `spark.graft.delta.logStore = <fully.qualified.ClassName>` (no-arg
  * constructor, resolved once per class); the default [[LogStore.Hadoop]]
  * keeps the pre-trait behavior bit-for-bit.
  */
trait LogStore {

  /** Write `body` at `dst` only if `dst` is absent. True = this writer
    * owns the version; false = the version already exists (lost the
    * race). Implementations WITHOUT a native atomic create-if-absent
    * must still DETECT the lost-commit conflict (e.g. write-then-verify)
    * and report false — silently overwriting a concurrent writer's
    * commit corrupts the log's linear history. */
  def putIfAbsent(fs: FileSystem, dst: Path, body: Array[Byte]): Boolean

  /** Replace `dst` with `body` such that readers see the old body or the
    * new one, never a torn intermediate. */
  def overwrite(fs: FileSystem, dst: Path, body: Array[Byte]): Unit
}

object LogStore {

  /** Local/HDFS-semantics store (the default): local filesystems commit
    * via an atomic hard link (link(2) fails if the destination exists,
    * closing the check-then-create race); every other Hadoop filesystem
    * uses `create(overwrite = false)`, HDFS-atomic per the protocol's
    * LogStore contract. Pointer overwrite is temp-write + rename. */
  object Hadoop extends LogStore {

    override def putIfAbsent(fs: FileSystem, dst: Path, body: Array[Byte]): Boolean =
      if (fs.getScheme == "file") {
        val tmp = new Path(dst.getParent, s".tmp-${java.util.UUID.randomUUID()}.json")
        val out = fs.create(tmp, true)
        try { out.write(body) } finally out.close()
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally fs.delete(tmp, false)
      } else {
        if (fs.exists(dst)) return false
        try {
          val out = fs.create(dst, false)
          try { out.write(body) } finally out.close()
          true
        } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      }

    override def overwrite(fs: FileSystem, dst: Path, body: Array[Byte]): Unit = {
      val tmp = new Path(dst.getParent, s".lcp-tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      fs.delete(dst, false)
      require(fs.rename(tmp, dst), s"delta: pointer update failed at $dst")
    }
  }

  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** The session's store: `spark.graft.delta.logStore` names a class
    * with a no-arg constructor (instantiated once per class name),
    * otherwise [[Hadoop]]. */
  def forSession(spark: SparkSession): LogStore =
    spark.conf.getOption("spark.graft.delta.logStore") match {
      case None => Hadoop
      case Some(cls) => instances.computeIfAbsent(cls, c =>
        Class.forName(c).getDeclaredConstructor().newInstance()
          .asInstanceOf[LogStore])
    }
}
