package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-document segment dedup ([[SegmentDedup]]): hand-checked
  * first-wins semantics (cross-doc, within-doc, all-dropped, short tail),
  * equivalence to a window-function reference on a random corpus, the
  * skew-safe plan shape (no Window operator anywhere), the whitespace-class
  * split, and the empty-text sequence guard. */
class SegmentDedupSpec extends SparkSpec {

  import spark.implicits._

  private val A = (0 until 10).map(i => s"a$i").mkString(" ") // one full segment
  private val B = (0 until 10).map(i => s"b$i").mkString(" ")
  private val C = (0 until 10).map(i => s"c$i").mkString(" ")

  test("hand-checked first-wins: cross-doc, within-doc, all-dropped, short tail") {
    val docs = Seq(
      (1L, s"$A $B"),          // both first occurrences
      (2L, s"$B $C tail tip"), // B dropped (seen in doc 1); C + 2-word tail kept
      (3L, s"$A $A"),          // within-doc repeat AND cross-doc: both dropped
      (4L, s"$C tail tip")     // fully seen (C in doc 2, "tail tip" in doc 2): all dropped
    ).toDF("doc_id", "text")
    val got = SegmentDedup.clean(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> ((s"$A $B", 2L, 0L)),
      2L -> ((s"$C tail tip", 2L, 1L)),
      3L -> (("", 0L, 2L)),
      4L -> (("", 0L, 2L))), s"got $got")
  }

  test("segments split on the whitespace class and keep original order") {
    // tab/newline-joined words must segment like space-joined ones
    val docs = Seq((1L, s"${A.replace(' ', '\t')}\n$B")).toDF("doc_id", "text")
    val segs = SegmentDedup.segments(docs).orderBy("seg_idx")
      .select("seg").as[String].collect()
    assert(segs === Array(A, B))
  }

  test("empty/whitespace-only text is ONE empty segment, not ghost segments") {
    // sequence(0, -1) in Spark DESCENDS; the greatest() guard pins this edge
    val docs = Seq((1L, ""), (2L, "   "), (3L, A)).toDF("doc_id", "text")
    val segs = SegmentDedup.segments(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("seg").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(segs(1L) === ((1L, "")))
    assert(segs(3L) === ((1L, A)))
    // doc 2: split("   ", "\s+") = ["", ""] → one segment of " " (concat_ws
    // keeps empties) — a single segment, but distinct from doc 1's ""
    assert(segs(2L) === ((1L, " ")))
    // two EMPTY docs produce identical "" segments; first-wins dedups them
    val twoEmpty = Seq((1L, ""), (2L, ""), (3L, A)).toDF("doc_id", "text")
    val dropped = SegmentDedup.clean(twoEmpty)
      .filter(col("doc_id") === 2L).select("n_dropped").as[Long].head()
    assert(dropped === 1L)
  }

  test("equivalent to a window-function first-wins reference on a random corpus") {
    val rnd = new scala.util.Random(19)
    // small vocab + short segments so collisions actually happen
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until (5 + rnd.nextInt(40)))
        .map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }.toDF("doc_id", "text")
    val k = 3
    val got = SegmentDedup.clean(docs, k)
    val ref = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(col("seg"))).orderBy(col("doc_id"), col("seg_idx"))
      SegmentDedup.segments(docs, k)
        .withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(
          array_join(expr("transform(array_sort(collect_list(" +
            "CASE WHEN rn = 1 THEN struct(seg_idx, seg) END)), x -> x.seg)"), " ")
            .as("clean_text"),
          count(when(col("rn") === 1, 1)).as("n_kept"),
          count(when(col("rn") > 1, 1)).as("n_dropped"))
    }
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "groupBy-min form diverges from the window-function truth")
    // the corpus exercised real drops
    assert(got.agg(sum("n_dropped")).head.getLong(0) > 0)
  }

  test("plan shape: no Window operator — first-wins is the map-side-combinable aggregate") {
    val docs = Seq((1L, A), (2L, B)).toDF("doc_id", "text")
    val plan = SegmentDedup.clean(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skew-unsafe window in plan:\n$plan")
  }

  test("spanRemove hand-checked: region cut wherever it starts, short docs untouched") {
    val L = 5
    val R = "r0 r1 r2 r3 r4 r5 r6" // 7-token region, duplicated with offset
    val docs = Seq(
      (1L, s"$A $R"),            // first occurrence of R's windows (tail of doc 1)
      (2L, s"x0 x1 x2 $R y0"),   // R re-occurs mid-doc -> exactly its 7 tokens cut
      (3L, "s0 s1 s2 s3"),       // < L words: no windows, untouched
      (4L, s"$A $R")             // exact duplicate of doc 1: empties entirely
    ).toDF("doc_id", "text")
    val got = SegmentDedup.spanRemove(docs, L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((s"$A $R", 17L, 0L)), s"got ${got(1L)}")
    assert(got(2L) === (("x0 x1 x2 y0", 11L, 7L)), s"got ${got(2L)}")
    assert(got(3L) === (("s0 s1 s2 s3", 4L, 0L)))
    assert(got(4L) === (("", 17L, 17L)), s"got ${got(4L)}")
  }

  test("spanRemove within-doc periodic repetition keeps one period") {
    // "p p p ... p" (12 tokens): window at start 0 is first, all later
    // starts are duplicates -> positions 1..11 covered, one token survives
    val docs = Seq((1L, Seq.fill(12)("p").mkString(" "))).toDF("doc_id", "text")
    val r = SegmentDedup.spanRemove(docs, 4).head()
    assert((r.getString(1), r.getLong(2), r.getLong(3)) === (("p", 12L, 11L)))
  }

  test("spanRemove agrees with a window-function + token-explode reference") {
    val rnd = new scala.util.Random(23)
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(30)))
        .map(_ => s"w${rnd.nextInt(4)}").mkString(" "))
    }.toDF("doc_id", "text")
    val L = 4
    val got = SegmentDedup.spanRemove(docs, L)
    val ref = {
      import org.apache.spark.sql.expressions.Window
      val words = docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
      val wfw = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("start"))
      val covered = words.filter(size(col("w")) >= L)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(w) - $L), s -> md5(concat_ws(' ', slice(w, s + 1, $L))))")))
        .toDF("doc_id", "start", "fp")
        .withColumn("rn", row_number().over(wfw))
        .filter(col("rn") > 1)
        .select(col("doc_id"), explode(expr(s"sequence(start, start + ${L - 1})")).as("pos"))
        .distinct()
      val toks = words.select(col("doc_id"), posexplode(col("w"))).toDF("doc_id", "pos", "tok")
      toks.join(covered.withColumn("hit", lit(1)), Seq("doc_id", "pos"), "left")
        .groupBy("doc_id")
        .agg(
          array_join(expr("transform(array_sort(collect_list(" +
            "CASE WHEN hit IS NULL THEN struct(pos, tok) END)), x -> x.tok)"), " ")
            .as("clean_text"),
          count(lit(1)).as("n_tokens"),
          count(col("hit")).as("n_removed"))
    }
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "in-row cut diverges from the token-explode truth")
    assert(got.agg(sum("n_removed")).head.getLong(0) > 0, "fixture exercised no cuts")
  }

  test("spanScrub cuts EVERY eval-matching occurrence — no first-wins exemption") {
    val L = 4
    val E = "e0 e1 e2 e3 e4" // 5-token eval passage
    val train = Seq(
      (1L, s"$E x0"),          // leading eval passage -> 5 tokens cut
      (2L, s"y0 $E y1 $E"),    // BOTH occurrences cut (10 tokens)
      (3L, "z0 z1 z2 z3 z4")   // clean doc untouched
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, s"pre $E post")).toDF("doc_id", "text")
    val got = SegmentDedup.spanScrub(train, eval_, L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> (("x0", 6L, 5L)),
      2L -> (("y0 y1", 12L, 10L)),
      3L -> (("z0 z1 z2 z3 z4", 5L, 0L))), s"got $got")
    // and scrubbing is NOT spanRemove: within-train duplication alone
    // (doc 2's repeated passage) is untouched when eval doesn't match
    val noHit = SegmentDedup.spanScrub(train,
      Seq((100L, "q0 q1 q2 q3")).toDF("doc_id", "text"), L).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(noHit === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("spanScrub sub-L eval docs contribute no fingerprints; sub-L train docs pass through") {
    val L = 6
    val train = Seq((1L, "a b c"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c")).toDF("doc_id", "text") // 3 < L: no windows
    val got = SegmentDedup.spanScrub(train, eval_, L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(got === Map(1L -> (("a b c", 0L)), 2L -> (("a b c d e f g", 0L))))
  }

  test("cleanAgainst hand-checked: catalog always wins, batch first-wins on novel segments") {
    val prior = Seq((1L, s"$A $B")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"$A $C"),  // A in catalog -> drops (even as batch-first); C novel -> kept
      (11L, s"$C $A")   // C seen at doc 10 -> drops; A in catalog -> drops
    ).toDF("doc_id", "text")
    val got = SegmentDedup.cleanAgainst(batch,
      SegmentDedup.segmentFingerprints(prior)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      10L -> ((C, 1L, 1L)),
      11L -> (("", 0L, 2L))), s"got $got")
  }

  test("cleanAgainst equals full clean over history++batch restricted to batch docs") {
    val rnd = new scala.util.Random(31)
    val mk = (ids: Range) => ids.map { i =>
      (i.toLong, (0 until (5 + rnd.nextInt(35)))
        .map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }
    val history = mk(0 until 120).toDF("doc_id", "text")
    val batch = mk(1000 until 1100).toDF("doc_id", "text")
    val k = 3
    val incremental = SegmentDedup.cleanAgainst(batch,
      SegmentDedup.segmentFingerprints(history, k), k)
    // all history ids < batch ids, so full-corpus first-wins gives
    // history priority — the incremental form must reproduce it exactly
    val full = SegmentDedup.clean(history.union(batch), k)
      .filter(col("doc_id") >= 1000L)
    assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty,
      "incremental form diverges from the full-corpus truth")
    assert(incremental.agg(sum("n_dropped")).head.getLong(0) > 0)
  }

  test("counts are conserved: kept + dropped per doc == segments per doc") {
    val docs = graft.Tables.table(spark, sfDir, "documents")
    val cleaned = SegmentDedup.clean(docs)
    val bySeg = SegmentDedup.segments(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val bad = cleaned.join(bySeg, "doc_id")
      .filter(col("n_kept") + col("n_dropped") =!= col("n")).count()
    assert(bad === 0L)
    // and the corpus-wide kept count equals the number of DISTINCT segments
    val distinctSegs = SegmentDedup.segments(docs).select("seg").distinct().count()
    assert(cleaned.agg(sum("n_kept")).head.getLong(0) === distinctSegs)
    // the dedup INVARIANT: surviving segment occurrences are pairwise
    // distinct across the whole corpus (each fingerprint kept exactly once)
    val kept = SegmentDedup.markFirst(SegmentDedup.segments(docs))
      .filter(col("kept")).select("seg")
    assert(kept.count() === kept.distinct().count())
  }
}
