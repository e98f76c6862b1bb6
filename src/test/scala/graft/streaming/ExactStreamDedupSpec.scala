package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.ExactStreamDedup.{KeyedDoc, KeyedEventDoc}

/** Ingest-time exact dedup ([[ExactStreamDedup]]): first-per-fingerprint
  * across micro-batches with a deterministic within-batch survivor, a
  * processing-time TTL that evicts quiet keys so state stays bounded by
  * the ACTIVE fingerprint set — and, because each phase below is a
  * RESTART from the shared checkpoint, the seen-set provably survives
  * restarts. (AvailableNow runs per phase: with a processing-time
  * timeout configured the engine keeps scheduling no-data batches, so a
  * long-lived query's processAllAvailable never settles.) */
class ExactStreamDedupSpec extends SparkSpec {

  import spark.implicits._

  private def runOnce(source: MemoryStream[KeyedDoc], cp: String,
                      ttl: Long, inputRows: Long): Seq[KeyedDoc] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[KeyedDoc]()
    val q = ExactStreamDedup.firstPerKey(spark, source.toDS(), ttlSeconds = ttl)
      .writeStream
      .option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyedDoc], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()
    // with a processing-time timeout configured the engine keeps
    // scheduling timeout-evaluation batches, so neither
    // processAllAvailable nor awaitTermination settles — wait until
    // this phase's INPUT rows are consumed (query progress), grace for
    // the commit, then stop explicitly (never leave the phase's query
    // alive to race the next phase's run on the same checkpoint)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def consumed(): Long = q.recentProgress.map(_.numInputRows).sum
    while (consumed() < inputRows && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(consumed() >= inputRows, s"phase input not consumed in time")
    Thread.sleep(500)
    q.stop()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("first per fingerprint across batches and RESTARTS; min doc_id survives in-batch") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    val cp = java.nio.file.Files.createTempDirectory("esd1").toString
    // phase 1: an in-batch duplicate of "a" — doc 1 (min id) survives
    source.addData(
      KeyedDoc("a", 2L, "ta"), KeyedDoc("a", 1L, "ta"),
      KeyedDoc("b", 3L, "tb"))
    val out1 = runOnce(source, cp, ttl = 0L, inputRows = 3L)
    assert(out1.map(d => d.key -> d.doc_id).toMap === Map("a" -> 1L, "b" -> 3L))
    // phase 2 is a RESTART from the checkpoint: "a" replays across
    // batches AND across the restart — the seen-set is durable state
    source.addData(KeyedDoc("a", 4L, "ta"), KeyedDoc("c", 5L, "tc"))
    val out2 = runOnce(source, cp, ttl = 0L, inputRows = 2L)
    assert(out2.map(d => d.key -> d.doc_id).toMap === Map("c" -> 5L),
      s"a restarted query must still refuse seen fingerprints: $out2")
  }

  test("a TTL evicts quiet fingerprints; the key dedupes afresh after it") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    val cp = java.nio.file.Files.createTempDirectory("esd2").toString
    // the TTL must comfortably exceed the per-phase RESTART latency
    // (each phase is a fresh AvailableNow run), or the key would evict
    // between phases and the "still a duplicate" step races the clock
    val ttl = 20L
    source.addData(KeyedDoc("a", 1L, "ta"))
    assert(runOnce(source, cp, ttl = ttl, inputRows = 1L).map(_.doc_id) === Seq(1L))
    // within the TTL: still a duplicate
    source.addData(KeyedDoc("a", 2L, "ta"))
    assert(runOnce(source, cp, ttl = ttl, inputRows = 1L).isEmpty)
    // sit out the TTL, then tick a batch so the timeout fires and
    // evicts, then replay the key — it passes again (the documented
    // memory-vs-horizon contract, dropDuplicatesWithinWatermark-style)
    Thread.sleep(ttl * 1000 + 1000)
    source.addData(KeyedDoc("z", 9L, "tz"))
    assert(runOnce(source, cp, ttl = ttl, inputRows = 1L).map(_.key) === Seq("z"))
    source.addData(KeyedDoc("a", 3L, "ta"))
    val out = runOnce(source, cp, ttl = ttl, inputRows = 1L)
    assert(out.map(d => d.key -> d.doc_id) === Seq("a" -> 3L),
      s"the key must re-emit only after eviction: $out")
  }

  private def runEventOnce(source: MemoryStream[KeyedEventDoc], cp: String,
                           horizonMs: Long, inputRows: Long): Seq[KeyedEventDoc] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[KeyedEventDoc]()
    val q = ExactStreamDedup.firstPerKeyEventTime(spark,
      source.toDS().withWatermark("event_ts", "10 seconds"), horizonMs)
      .writeStream
      .option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyedEventDoc], _: Long) =>
        batch.collect().foreach(got.add)
      }
      .start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def consumed(): Long = q.recentProgress.map(_.numInputRows).sum
    while (consumed() < inputRows && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(consumed() >= inputRows, s"phase input not consumed in time")
    Thread.sleep(500)
    q.stop()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  /** The full event-time scenario as one run: four phases, each a
    * RESTART from the shared checkpoint, with `pauseMs` of wall-clock
    * silence inserted between phases. Returns every emitted row in
    * order. The event clock is FIXED data, so two runs with different
    * pauses must emit identically — the replay-determinism property the
    * processing-time TTL cannot offer (round-16 verdict #2 ask). */
  private def eventScenario(pauseMs: Long): Seq[(String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedEventDoc]
    val cp = java.nio.file.Files.createTempDirectory("esdE").toString
    val horizon = 60L * 1000 // fingerprints live 60s of EVENT time
    val t0 = 1767261600000L  // a fixed event-clock origin
    def ts(offsetS: Long) = new java.sql.Timestamp(t0 + offsetS * 1000)
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyedEventDoc]
    // phase 1: in-batch duplicate of "a" — min doc_id survives
    source.addData(
      KeyedEventDoc("a", 2L, "ta", ts(0)),
      KeyedEventDoc("a", 1L, "ta", ts(1)),
      KeyedEventDoc("b", 3L, "tb", ts(5)))
    out ++= runEventOnce(source, cp, horizon, inputRows = 3L)
    Thread.sleep(pauseMs)
    // phase 2 (restart): "a" again, 6s of EVENT time later — inside
    // the horizon, dropped no matter how long the WALL clock paused
    source.addData(
      KeyedEventDoc("a", 4L, "ta", ts(6)),
      KeyedEventDoc("c", 5L, "tc", ts(7)))
    out ++= runEventOnce(source, cp, horizon, inputRows = 2L)
    Thread.sleep(pauseMs)
    // phase 3: a far-future event advances the watermark past "a"'s
    // horizon (lastSeen t0+6s + 60s)
    source.addData(KeyedEventDoc("w", 6L, "tw", ts(300)))
    out ++= runEventOnce(source, cp, horizon, inputRows = 1L)
    Thread.sleep(pauseMs)
    // phase 4: "a" re-arrives AFTER the horizon passed — it must
    // re-open in the very first batch that sees it (data-path eviction,
    // not just the silent-key timeout), dropDuplicatesWithinWatermark
    // parity
    source.addData(
      KeyedEventDoc("a", 7L, "ta", ts(301)),
      KeyedEventDoc("d", 8L, "td", ts(301)))
    out ++= runEventOnce(source, cp, horizon, inputRows = 2L)
    out.map(d => d.key -> d.doc_id).toSeq
  }

  test("event-time dedup: watermark horizon, restart-durable, deterministic under wall-clock shifts") {
    val fast = eventScenario(pauseMs = 0L)
    assert(fast.toSet === Set(
      "a" -> 1L, "b" -> 3L, "c" -> 5L, "w" -> 6L, "a" -> 7L, "d" -> 8L),
      s"got $fast")
    assert(fast.size === 6, s"got $fast")
    // the same DATA with multi-second wall-clock pauses between phases:
    // identical output — eviction rides the event clock only (the
    // processing-time TTL variant would have evicted during the pauses)
    val slow = eventScenario(pauseMs = 2500L)
    assert(slow.toSet === fast.toSet && slow.size === fast.size,
      s"wall-clock pauses changed the output: fast=$fast slow=$slow")
  }

  test("byContent fingerprints match the batch exact-dedup convention (md5)") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye"))
      .toDF("doc_id", "text")
    val keyed = ExactStreamDedup.byContent(spark, docs).collect()
    assert(keyed.filter(_.text == "hello world").map(_.key).distinct.length === 1)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("bye".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(keyed.find(_.doc_id == 3L).get.key === expected)
  }
}
