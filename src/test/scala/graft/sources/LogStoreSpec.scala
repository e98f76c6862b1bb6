package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.SparkSpec
import graft.sources.delta.{DeltaLog, DeltaTable, LogStore}

/** A deliberately NON-atomic store (the object-store shape: no native
  * create-if-absent) that still honors the [[LogStore]] contract by
  * write-then-verify: after writing, it reads the destination back and
  * reports a lost commit when another writer's body is there. The spec
  * drives a concurrent overwrite into the race window via [[betweenHook]]
  * and proves the log DETECTS the conflict instead of silently losing a
  * commit — the testable design the local-only caveat was promoted to. */
class NonAtomicVerifyingLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, dst: Path, body: Array[Byte]): Boolean = {
    if (fs.exists(dst)) return false
    val out = fs.create(dst, true) // non-atomic overwrite: the object-store hazard
    try out.write(body) finally out.close()
    NonAtomicVerifyingLogStore.betweenHook(dst) // racing writer lands here
    val in = fs.open(dst)
    val got = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toByteArray
    } finally in.close()
    // verify: someone else's body at dst = lost the race, observably
    java.util.Arrays.equals(got, body)
  }

  override def overwrite(fs: FileSystem, dst: Path, body: Array[Byte]): Unit = {
    val out = fs.create(dst, true)
    try out.write(body) finally out.close()
  }
}

object NonAtomicVerifyingLogStore {
  @volatile var betweenHook: Path => Unit = _ => ()
}

/** A local fs masquerading as a foreign scheme whose NEXT destination
  * create returns a stream that lands a torn prefix and then fails —
  * the mid-copy network-failure window of the create-no-overwrite +
  * copy fallback (round-15 verdict #3 / ADVICE). Temp-file writes are
  * never failed: the window under test is strictly after the slot is
  * claimed. */
class FailingCopyFileSystem extends org.apache.hadoop.fs.LocalFileSystem {
  override def getScheme: String = "mockfail"
  override def create(f: Path,
                      overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream = {
    val out = super.create(f, overwrite)
    if (FailingCopyFileSystem.failNext && !overwrite &&
        !f.getName.startsWith(".tmp-")) {
      FailingCopyFileSystem.failNext = false
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.FilterOutputStream(out) {
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            out.write(b, off, math.min(len, 4)) // a torn prefix lands
            out.flush()
            throw new java.io.IOException("mid-copy network failure")
          }
        }, null)
    } else out
  }
}

object FailingCopyFileSystem {
  @volatile var failNext: Boolean = false
}

/** A store whose `create(dst, overwrite=false)` signals an EXISTING
  * destination with a plain `IOException` instead of
  * `FileAlreadyExistsException` — the Hadoop contract allows both, and
  * the round-16 verdict asked which one claims the slot to be pinned:
  * neither may surface as an error; both mean "lost the race". */
class PlainIoExistsFileSystem extends org.apache.hadoop.fs.LocalFileSystem {
  override def getScheme: String = "mockio"
  override def create(f: Path,
                      overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f))
      throw new java.io.IOException(s"destination exists (plain): $f")
    super.create(f, overwrite)
  }
}

class LogStoreSpec extends SparkSpec {

  import spark.implicits._

  private def fsOf(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("default store preserves behavior: hard-link commit, loser sees false") {
    val t = java.nio.file.Files.createTempDirectory("lstore0").toString + "/t"
    assert(DeltaLog.commit(spark, t, 0L, Seq(DeltaLog.protocolAction)))
    // same version again = lost race, observable, nothing overwritten
    assert(!DeltaLog.commit(spark, t, 0L, Seq(DeltaLog.protocolAction)))
    assert(DeltaLog.versions(spark, t) === Seq(0L))
  }

  test("a non-atomic store still DETECTS the lost-commit conflict (write-then-verify)") {
    spark.conf.set("spark.graft.delta.logStore",
      classOf[NonAtomicVerifyingLogStore].getName)
    try {
      val t = java.nio.file.Files.createTempDirectory("lstore1").toString + "/t"
      assert(DeltaLog.commit(spark, t, 0L, Seq(DeltaLog.protocolAction)),
        "uncontended commit must succeed through the pluggable store")
      // contended commit: a competing writer overwrites version 1 inside
      // this writer's race window (after its write, before its verify) —
      // exactly the interleaving a non-atomic create cannot exclude
      val competing = "{\"commitInfo\":{\"operation\":\"COMPETING\"}}\n"
        .getBytes("UTF-8")
      NonAtomicVerifyingLogStore.betweenHook = { dst =>
        NonAtomicVerifyingLogStore.betweenHook = _ => () // fire once
        val fs = fsOf(t)
        val out = fs.create(dst, true)
        try out.write(competing) finally out.close()
      }
      val won = DeltaLog.commit(spark, t, 1L,
        Seq(DeltaLog.commitInfoAction("LOSER")))
      assert(!won, "the overwritten writer must observe the lost commit")
      // the competing writer's body stands; the loser's was never
      // silently installed — the log's linear history is intact
      val kept = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_delta_log",
          f"${1L}%020d.json")), "UTF-8")
      assert(kept === new String(competing, "UTF-8"))
      // the loser retries at the next version, as the commit contract says
      assert(DeltaLog.commit(spark, t, 2L,
        Seq(DeltaLog.commitInfoAction("RETRY"))))
      assert(DeltaLog.versions(spark, t) === Seq(0L, 1L, 2L))
    } finally {
      spark.conf.unset("spark.graft.delta.logStore")
      NonAtomicVerifyingLogStore.betweenHook = _ => ()
    }
  }

  test("streamed commit on a non-local scheme uses create-if-absent (loser cannot clobber)") {
    // a local fs masquerading under a foreign scheme drives the
    // NON-local branch: commit must go through create(overwrite=false)
    // + copy-from-tmp — the round-15 ADVICE fix; the old
    // exists-then-rename let two racers both pass the check on stores
    // whose rename overwrites, and the loser clobbered the winner.
    // The allowlist conf excludes "file" so the qualified destination
    // (file:, which HAS a FileContext) still takes the object-store
    // fallback under test — and that exclusion working IS the round-16
    // advice pin: a scheme with a FileContext but outside the
    // HDFS-semantics allowlist must NOT get the rename path.
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.delta.logStore.renameSchemes", "hdfs,viewfs")
    val fs = new org.apache.hadoop.fs.LocalFileSystem() {
      override def getScheme: String = "mock"
    }
    fs.initialize(new java.net.URI("file:///"), conf)
    val dir = java.nio.file.Files.createTempDirectory("lstore_mock").toString
    val dst = new Path(dir, "00000000000000000000.json")
    assert(LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("line-one\n".getBytes("UTF-8"))))
    // second streamed commit to the same version: observably lost,
    // winner's body intact
    assert(!LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("line-two\n".getBytes("UTF-8"))))
    val kept = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst.toUri.getPath)), "UTF-8")
    assert(kept === "line-one\n", "the loser must not clobber the winner")
    // both attempts cleaned their temp files
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith(".tmp-")) === 0, "no tmp litter")
  }

  test("non-local commit: a mid-copy failure cannot poison the version slot") {
    // create-no-overwrite claims the slot, then the copy dies mid-body:
    // without recovery the torn dst makes every retry see "exists" and
    // the table wedges at this version (round-15 verdict #3). The store
    // must delete the partial destination before rethrowing.
    // allowlist excludes "file": the copy fallback (not FileContext
    // rename) must run, so the failure-injection window is reachable
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.delta.logStore.renameSchemes", "hdfs,viewfs")
    val fs = new FailingCopyFileSystem()
    fs.initialize(new java.net.URI("file:///"), conf)
    val dir = java.nio.file.Files.createTempDirectory("lstore_torn").toString
    val body = "{\"commitInfo\":{\"operation\":\"FULL COMMIT\"}}\n"
    // streamed form
    val dst1 = new Path(dir, "00000000000000000001.json")
    FailingCopyFileSystem.failNext = true
    val e1 = intercept[java.io.IOException](LogStore.Hadoop
      .putIfAbsentStreamed(fs, dst1, Iterator(body.getBytes("UTF-8"))))
    assert(e1.getMessage.contains("mid-copy"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "00000000000000000001.json")),
      "the torn destination must be deleted, not left claiming the slot")
    // the slot is retryable and the retry's body lands complete
    assert(LogStore.Hadoop.putIfAbsentStreamed(fs, dst1,
      Iterator(body.getBytes("UTF-8"))), "retry must find the slot free")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000001.json")),
      "UTF-8") === body)
    // byte form shares the same recovery
    val dst2 = new Path(dir, "00000000000000000002.json")
    FailingCopyFileSystem.failNext = true
    val e2 = intercept[java.io.IOException](
      LogStore.Hadoop.putIfAbsent(fs, dst2, body.getBytes("UTF-8")))
    assert(e2.getMessage.contains("mid-copy"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "00000000000000000002.json")))
    assert(LogStore.Hadoop.putIfAbsent(fs, dst2, body.getBytes("UTF-8")))
    // no tmp litter from any of the four attempts
    assert(new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith(".tmp-") &&
        !f.getName.endsWith(".crc")) === 0, "no tmp litter")
  }

  test("non-local commit on a FileContext scheme goes through atomic rename; loser observable") {
    // a scheme-qualified destination on a filesystem that HAS a
    // FileContext takes the rename-no-overwrite path (upstream
    // HDFSLogStore's primitive): the destination is never visible
    // half-written, and rename-onto-existing reports the lost race
    val fs = new org.apache.hadoop.fs.LocalFileSystem() {
      override def getScheme: String = "mock"
    }
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files.createTempDirectory("lstore_fc").toString
    val dst = new Path(s"file:$dir/00000000000000000000.json")
    assert(LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("line-one\n".getBytes("UTF-8"))))
    assert(!LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("line-two\n".getBytes("UTF-8"))),
      "rename onto an existing version must report the lost race")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000000.json")),
      "UTF-8") === "line-one\n", "the loser must not clobber the winner")
    // byte form: same primitive
    val dst1 = new Path(s"file:$dir/00000000000000000001.json")
    assert(LogStore.Hadoop.putIfAbsent(fs, dst1, "b1\n".getBytes("UTF-8")))
    assert(!LogStore.Hadoop.putIfAbsent(fs, dst1, "b2\n".getBytes("UTF-8")))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000001.json")),
      "UTF-8") === "b1\n")
  }

  test("scheme-less destination is qualified and takes the atomic rename path") {
    // a default-FS-relative destination (the common '/path' HDFS shape)
    // has a NULL raw URI scheme; routing by raw scheme silently dropped
    // it to the copy fallback — the exact torn-destination window the
    // rename path exists to close (round-16 advice, medium). The store
    // must qualify the destination against the filesystem first. Proof
    // shape: a failure-injecting fs whose create(dst, false) tears the
    // body — if the fallback ran, the commit would throw mid-copy; via
    // FileContext rename the injected failure is never reachable.
    val fs = new FailingCopyFileSystem() // default conf: "file" allowlisted
    fs.initialize(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    val dir = java.nio.file.Files.createTempDirectory("lstore_qual").toString
    val dst = new Path(dir, "00000000000000000000.json") // scheme-less
    assert(dst.toUri.getScheme == null, "precondition: raw scheme is null")
    FailingCopyFileSystem.failNext = true
    try {
      assert(LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
        Iterator("qualified-rename\n".getBytes("UTF-8"))),
        "a scheme-less destination must commit via the rename path")
      assert(FailingCopyFileSystem.failNext,
        "the create-no-overwrite fallback must never have been invoked")
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "00000000000000000000.json")),
        "UTF-8") === "qualified-rename\n")
      // loser stays observable through the same qualified rename
      assert(!LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
        Iterator("loser\n".getBytes("UTF-8"))))
    } finally FailingCopyFileSystem.failNext = false
  }

  test("plain IOException from create on an existing destination is a lost race, not an error") {
    // pinned per round-16 verdict #4: a store may signal "destination
    // exists" from create(dst, false) with a plain IOException rather
    // than FileAlreadyExistsException — the outcome must be the same
    // observable lost race (false), never a surfaced error, and never
    // the winner's body clobbered
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.delta.logStore.renameSchemes", "hdfs,viewfs")
    val fs = new PlainIoExistsFileSystem()
    fs.initialize(new java.net.URI("file:///"), conf)
    val dir = java.nio.file.Files.createTempDirectory("lstore_io").toString
    val dst = new Path(dir, "00000000000000000000.json")
    assert(LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("winner\n".getBytes("UTF-8"))))
    assert(!LogStore.Hadoop.putIfAbsentStreamed(fs, dst,
      Iterator("loser\n".getBytes("UTF-8"))),
      "plain-IOException-on-exists must report the lost race")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000000.json")),
      "UTF-8") === "winner\n", "the loser must not clobber the winner")
    // a genuine IOException (destination NOT existing) still surfaces:
    // swallowing it would turn real storage failures into silent losses
    val dst2 = new Path(dir, "sub/00000000000000000001.json")
    val failing = new PlainIoExistsFileSystem() {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream =
        if (!overwrite) throw new java.io.IOException("disk on fire")
        else super.create(f, overwrite)
    }
    failing.initialize(new java.net.URI("file:///"), conf)
    val e = intercept[java.io.IOException](LogStore.Hadoop
      .putIfAbsentStreamed(failing, dst2, Iterator("x\n".getBytes("UTF-8"))))
    assert(e.getMessage.contains("disk on fire"))
  }

  test("streamed commit: mid-stream failure leaves no torn version and no tmp litter") {
    // the chunk iterator is typically a LIVE Spark job; a task failure
    // mid-stream must never persist a truncated commit file (readers
    // would treat it as a committed version missing its adds) nor leak
    // the temp file into _delta_log (round-14 review findings)
    val t = java.nio.file.Files.createTempDirectory("lstore3").toString + "/t"
    assert(DeltaLog.commit(spark, t, 0L, Seq(DeltaLog.protocolAction)))
    val boom = new RuntimeException("executor lost mid-stream")
    val e = intercept[RuntimeException] {
      DeltaLog.commitStreamed(spark, t, 1L,
        Seq(DeltaLog.commitInfoAction("TORN")),
        Iterator("{\"remove\":{\"path\":\"a\"}}") ++ (throw boom),
        Seq.empty)
    }
    assert(e eq boom)
    assert(DeltaLog.versions(spark, t) === Seq(0L),
      "a failed streamed commit must not install a version")
    val logDir = java.nio.file.Paths.get(t, "_delta_log")
    import scala.jdk.CollectionConverters._
    val litter = java.nio.file.Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(".tmp-")).toSeq
    assert(litter.isEmpty, s"tmp litter left in _delta_log: $litter")
    // the version slot is still free: a retry commits cleanly
    assert(DeltaLog.commitStreamed(spark, t, 1L,
      Seq(DeltaLog.commitInfoAction("RETRY")),
      Iterator.empty, Seq.empty))
    assert(DeltaLog.versions(spark, t) === Seq(0L, 1L))
  }

  test("the default (concatenating) streamed form keeps third-party stores working") {
    spark.conf.set("spark.graft.delta.logStore",
      classOf[NonAtomicVerifyingLogStore].getName)
    try {
      val t = java.nio.file.Files.createTempDirectory("lstore4").toString + "/t"
      assert(DeltaLog.commitStreamed(spark, t, 0L,
        Seq(DeltaLog.protocolAction),
        Iterator("{\"commitInfo\":{\"operation\":\"STREAMED\"}}"),
        Seq.empty), "the trait default must delegate to putIfAbsent")
      assert(!DeltaLog.commitStreamed(spark, t, 0L,
        Seq(DeltaLog.protocolAction), Iterator.empty, Seq.empty),
        "losers must stay observable through the default form")
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_delta_log", f"${0L}%020d.json")), "UTF-8")
      assert(body.contains("STREAMED") && body.endsWith("\n"))
    } finally spark.conf.unset("spark.graft.delta.logStore")
  }

  test("the full write path runs unchanged through a pluggable store") {
    spark.conf.set("spark.graft.delta.logStore",
      classOf[NonAtomicVerifyingLogStore].getName)
    try {
      val t = java.nio.file.Files.createTempDirectory("lstore2").toString + "/t"
      DeltaTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "p"), t,
        org.apache.spark.sql.SaveMode.Append)
      DeltaTable.write(Seq((3L, "c")).toDF("k", "p"), t,
        org.apache.spark.sql.SaveMode.Append)
      // checkpoint exercises the pointer-overwrite primitive
      DeltaLog.checkpoint(spark, t)
      assert(DeltaTable.read(spark, t).count() === 3)
      assert(DeltaLog.lastCheckpointVersion(spark, t) === Some(1L))
    } finally spark.conf.unset("spark.graft.delta.logStore")
  }
}
