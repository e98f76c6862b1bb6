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

  /** [[putIfAbsent]] with the body arriving as CHUNKS — the commit form a
    * distributed overwrite needs: its remove actions stream off
    * `toLocalIterator` (one shuffle partition in driver memory at a
    * time) instead of materializing an O(#files) byte array. The default
    * CONCATENATES and delegates, which is correct for every store and
    * keeps pre-existing [[LogStore]] plug-ins working unchanged;
    * [[LogStore.Hadoop]] overrides it to truly stream. Same contract:
    * exactly-once per destination, losers return false, and a reader
    * must never observe a torn prefix as a committed version. */
  def putIfAbsentStreamed(fs: FileSystem, dst: Path,
                          chunks: Iterator[Array[Byte]]): Boolean = {
    val buf = new java.io.ByteArrayOutputStream()
    chunks.foreach(buf.write)
    putIfAbsent(fs, dst, buf.toByteArray)
  }
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

    /** True streaming — but never into `dst` directly: the chunk
      * iterator is typically a LIVE Spark job (`toLocalIterator` over a
      * checkpoint frame), and a task failure mid-stream must not leave a
      * truncated-but-closed commit file that readers would treat as a
      * committed version (the byte-array form materializes its body
      * first, so it never had this window). Both branches stream to a
      * TEMP file whose cleanup a finally guarantees even when the
      * iterator throws, then commit atomically: local filesystems via
      * the same hard link as [[putIfAbsent]], other schemes via
      * `create(dst, overwrite = false)` + copy-from-tmp — the SAME
      * primitive [[putIfAbsent]]'s byte form commits with, so the
      * exactly-once guarantee is identical (an exists-then-rename here
      * would let two racers both pass the check on stores whose rename
      * overwrites, and the loser would clobber the winner's commit).
      * The tmp body is complete and driver-local by then, so the copy
      * has no mid-stream-failure window. */
    override def putIfAbsentStreamed(fs: FileSystem, dst: Path,
                                     chunks: Iterator[Array[Byte]]): Boolean = {
      val tmp = new Path(dst.getParent, s".tmp-${java.util.UUID.randomUUID()}.json")
      try {
        val out = fs.create(tmp, true)
        try chunks.foreach(out.write) finally out.close()
        if (fs.getScheme == "file") {
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(dst.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        } else {
          try {
            val dstOut = fs.create(dst, false)
            try {
              val in = fs.open(tmp)
              try org.apache.hadoop.io.IOUtils.copyBytes(in, dstOut, 65536, false)
              finally in.close()
            } finally dstOut.close()
            true
          } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
        }
      } finally fs.delete(tmp, false)
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
