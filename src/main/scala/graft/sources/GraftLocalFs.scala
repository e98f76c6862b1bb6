package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file:` scheme FileSystem that sets POSIX permissions in-process.
  *
  * Hadoop's stock `RawLocalFileSystem` falls back to
  * `Shell.execCommand("chmod", ...)` — a fork+exec of /bin/chmod PER
  * CREATED FILE — whenever the libhadoop native library is absent
  * (it is absent in this container, and commonly in containerized local
  * deployments). Thread-dump sampling of the DML write path showed that
  * subprocess inside `RawLocalFileSystem.setPermission` on almost half
  * the runnable executor threads: every staged parquet file, CDF file,
  * deletion-vector sidecar, checksum sidecar and log JSON paid a fork of
  * a multi-GB JVM. `java.nio.file.Files.setPosixFilePermissions` is the
  * same chmod(2) without the subprocess.
  *
  * On a real cluster this class is moot — HDFS/object-store schemes never
  * touch it, and hosts with libhadoop take the native-chmod path that this
  * reimplements. It exists so that local-mode measurements price parquet
  * bytes, not fork(2).
  */
class GraftRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val f = pathToFile(p).toPath
    try java.nio.file.Files.setPosixFilePermissions(f, GraftLocalFs.toPosix(permission))
    catch {
      // non-POSIX store or exotic bits (setuid/sticky are not expressible
      // through the NIO view): fall back to the stock Shell path rather
      // than silently dropping the permission change
      case _: UnsupportedOperationException | _: SecurityException =>
        super.setPermission(p, permission)
    }
  }
}

/** Checksummed `file:` FileSystem over [[GraftRawLocalFileSystem]] —
  * drop-in for Hadoop's `LocalFileSystem` (same `.crc` read-side
  * verification of files that carry sidecars) minus the per-create chmod
  * subprocess, and with write-side checksum sidecars OFF by default:
  * every staged file otherwise doubles into file + `.crc` (two creates,
  * two chmods, twice the commit-protocol renames) to guard single-machine
  * scratch I/O that parquet already page-checksums. Set
  * `graft.local.writeChecksum=true` in the Hadoop conf to restore stock
  * behavior. Wire with `spark.hadoop.fs.file.impl=graft.sources.GraftLocalFileSystem`.
  */
class GraftLocalFileSystem extends LocalFileSystem(new GraftRawLocalFileSystem) {
  override def initialize(name: java.net.URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    if (!conf.getBoolean("graft.local.writeChecksum", false)) setWriteChecksum(false)
  }
}

private[sources] object GraftLocalFs {
  /** FsPermission (9 POSIX bits) → NIO permission set; setuid/setgid/
    * sticky have no NIO representation and make the caller fall back. */
  def toPosix(perm: FsPermission): java.util.Set[PosixFilePermission] = {
    val m = perm.toShort
    if ((m & ~0x1ff) != 0) throw new UnsupportedOperationException(
      f"mode $m%04o carries bits outside the POSIX rwx set")
    val s = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def bit(mask: Int, p: PosixFilePermission): Unit =
      if ((m & mask) != 0) { s.add(p); () }
    bit(0x100, OWNER_READ); bit(0x80, OWNER_WRITE); bit(0x40, OWNER_EXECUTE)
    bit(0x20, GROUP_READ); bit(0x10, GROUP_WRITE); bit(0x8, GROUP_EXECUTE)
    bit(0x4, OTHERS_READ); bit(0x2, OTHERS_WRITE); bit(0x1, OTHERS_EXECUTE)
    s
  }
}
