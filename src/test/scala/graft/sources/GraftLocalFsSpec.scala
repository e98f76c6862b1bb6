package graft.sources

import java.nio.file.attribute.PosixFilePermission._
import java.nio.file.{Files => JFiles, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The local-FS fast path Bench/Verify sessions wire via
  * `spark.hadoop.fs.file.impl` (round-19 optimization): permissions set
  * in-process (no /bin/chmod fork), write-side `.crc` sidecars off. */
class GraftLocalFsSpec extends AnyFunSuite {

  private def oct(s: String): FsPermission =
    new FsPermission(java.lang.Integer.parseInt(s, 8).toShort)

  private def freshFs(extra: (String, String)*): GraftLocalFileSystem = {
    val conf = new Configuration()
    conf.set("fs.file.impl", classOf[GraftLocalFileSystem].getName)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    extra.foreach { case (k, v) => conf.set(k, v) }
    new Path("file:///").getFileSystem(conf)
      .asInstanceOf[GraftLocalFileSystem]
  }

  test("toPosix maps each of the nine rwx bits") {
    assert(GraftLocalFs.toPosix(oct("644")).asScala ==
      Set(OWNER_READ, OWNER_WRITE, GROUP_READ, OTHERS_READ))
    assert(GraftLocalFs.toPosix(oct("755")).asScala ==
      Set(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE, GROUP_READ, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_EXECUTE))
    assert(GraftLocalFs.toPosix(oct("700")).asScala ==
      Set(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE))
    assert(GraftLocalFs.toPosix(oct("0")).asScala
      .isEmpty)
  }

  test("toPosix refuses bits outside the POSIX rwx set (caller falls back)") {
    // FsPermission models the sticky bit (setuid/setgid it drops on the
    // short round-trip) — sticky is the one exotic bit that can reach us
    intercept[UnsupportedOperationException] {
      GraftLocalFs.toPosix(oct("1644"))
    }
  }

  test("create writes no .crc sidecar by default; opt-in restores it") {
    val dir = JFiles.createTempDirectory("graft_fs").toString
    val fs = freshFs()
    val p = new Path(s"file://$dir/a.bin")
    val out = fs.create(p)
    out.write(Array[Byte](1, 2, 3)); out.close()
    assert(JFiles.exists(Paths.get(dir, "a.bin")))
    assert(!JFiles.exists(Paths.get(dir, ".a.bin.crc")),
      "write-side checksums must be off by default")
    // content round-trips through the same FS
    val in = fs.open(p)
    val buf = new Array[Byte](3); in.readFully(buf); in.close()
    assert(buf.toSeq == Seq[Byte](1, 2, 3))

    val fsCrc = freshFs("graft.local.writeChecksum" -> "true")
    val p2 = new Path(s"file://$dir/b.bin")
    val out2 = fsCrc.create(p2)
    out2.write(Array[Byte](9)); out2.close()
    assert(JFiles.exists(Paths.get(dir, ".b.bin.crc")),
      "graft.local.writeChecksum=true must restore stock sidecars")
  }

  test("setPermission applies POSIX bits in-process") {
    val dir = JFiles.createTempDirectory("graft_fs").toString
    val fs = freshFs()
    val p = new Path(s"file://$dir/c.bin")
    val out = fs.create(p); out.write(Array[Byte](7)); out.close()
    fs.setPermission(p, oct("600"))
    assert(JFiles.getPosixFilePermissions(Paths.get(dir, "c.bin")).asScala ==
      Set(OWNER_READ, OWNER_WRITE))
    fs.setPermission(p, oct("644"))
    assert(JFiles.getPosixFilePermissions(Paths.get(dir, "c.bin")).asScala ==
      Set(OWNER_READ, OWNER_WRITE, GROUP_READ, OTHERS_READ))
  }

  test("exotic bits fall back to the stock Shell path and still land") {
    val dir = JFiles.createTempDirectory("graft_fs").toString
    val fs = freshFs()
    val p = new Path(s"file://$dir/d.bin")
    val out = fs.create(p); out.write(Array[Byte](7)); out.close()
    // 1644: sticky bit — outside the NIO view, served by super (chmod)
    fs.setPermission(p, oct("1644"))
    val st = fs.getFileStatus(p)
    assert(st.getPermission.toShort == java.lang.Integer.parseInt("1644", 8).toShort)
  }

  test("mkdirs with permission works through the in-process path") {
    val dir = JFiles.createTempDirectory("graft_fs").toString
    val fs = freshFs()
    val p = new Path(s"file://$dir/x/y/z")
    assert(fs.mkdirs(p, oct("711")))
    assert(JFiles.isDirectory(Paths.get(dir, "x", "y", "z")))
  }
}
