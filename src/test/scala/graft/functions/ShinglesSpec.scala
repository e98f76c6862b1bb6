package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}

import graft.SparkSpec
import graft.operators.TextDedup

/** Pins the round-19 shingle kernels to the builtin-chain reference form
  * they replaced ([[TextDedup.shingleArrayExpr]]): the compiled loop must
  * produce the IDENTICAL distinct n-gram array (values AND first-occurrence
  * order) on adversarial word lists, and the fused Bloom gate must never
  * under-count the distinct form (the no-false-negative bound of
  * [[graft.operators.Decontaminate.bloomOverlaps]]). */
class ShinglesSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic adversarial corpora: repeated shingles, empty tokens
    * (split on doubled separators), unicode, single-word repetition, and
    * documents exactly n words long. */
  private def corpora(n: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "ab", "", "héllo", "wörld", "x y", "a")
    val random = (0 until 50).map { _ =>
      Seq.fill(n + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
    }
    random ++ Seq(
      Seq.fill(n)("same"),
      Seq.fill(n + 7)("same"),
      (0 until n).map(_.toString),
      Seq("", "", "", ""),
      Seq("repeat", "me", "repeat", "me", "repeat", "me"))
  }

  test("shingle_array equals the builtin-chain reference, values and order") {
    for (n <- Seq(2, 3, 5)) {
      val df = corpora(n).zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "w")
        .filter(size(col("w")) >= n)
      val both = df.select(
        CB.column(ShingleArray(CB.expression(col("w")), n)).as("kernel"),
        expr(TextDedup.shingleArrayExpr(n)).as("reference"))
      val bad = both.filter(col("kernel") =!= col("reference")).count()
      assert(bad === 0L, s"n=$n: kernel diverges from the reference chain")
    }
  }

  test("shingle_array handles size(w) < n (empty) and null input (null)") {
    val df = Seq((1L, Seq("only", "two")), (2L, null))
      .toDF("doc_id", "w")
    val out = df.select(
      CB.column(ShingleArray(CB.expression(col("w")), 3)).as("s")).collect()
    assert(out(0).getSeq[String](0) === Seq.empty)
    assert(out(1).isNullAt(0))
  }

  test("shingle_array is SQL-registered and matches the Column form") {
    GraftFunctions.register(spark)
    Seq(Tuple1(Seq("w1", "w2", "w3", "w2", "w3", "w4")))
      .toDF("w").createOrReplaceTempView("shingle_in")
    val viaSql = spark.sql("SELECT shingle_array(w, 2) AS s FROM shingle_in")
      .head().getSeq[String](0)
    assert(viaSql === Seq("w1 w2", "w2 w3", "w3 w2", "w3 w4"))
  }

  test("fused bloom gate never under-counts the distinct unfused form") {
    val keys = (0 until 500).map(i => s"k$i k${i + 1} k${i + 2}")
    val bloom = keys.toDF("s")
      .agg(CB.column(
        BloomFilterAgg(CB.expression(xxhash64(col("s"))), 1 << 14, 4)
          .toAggregateExpression()).as("b"))
      .head().getSeq[Long](0).toArray
    val docs = corpora(3) ++ Seq(
      (0 until 20).map(i => s"k$i"), // all shingles inserted
      Seq.fill(30)("k1") ++ Seq("k2", "k3")) // massive multiplicity
    val df = docs.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "w")
      .filter(size(col("w")) >= 3)
    val both = df.select(
      CB.column(ShingleBloomHits(CB.expression(col("w")), 3, bloom, 4)).as("fused"),
      CB.column(BloomHits(
        CB.expression(CB.column(ShingleArray(CB.expression(col("w")), 3))),
        bloom, 4)).as("distinct"))
    assert(both.filter(col("fused") < col("distinct")).count() === 0L,
      "fused gate under-counted — the no-false-negative bound is broken")
    // and on duplicate-free docs the two are EQUAL (multiplicity is the
    // only divergence)
    val dupFree = Seq(Tuple1((0 until 20).map(i => s"k$i"))).toDF("w")
    val eq = dupFree.select(
      CB.column(ShingleBloomHits(CB.expression(col("w")), 3, bloom, 4)).as("fused"),
      CB.column(BloomHits(
        CB.expression(CB.column(ShingleArray(CB.expression(col("w")), 3))),
        bloom, 4)).as("distinct")).head()
    assert(eq.getInt(0) === eq.getInt(1))
  }

  test("bloomOverlaps (fused gate) still equals exact overlaps end-to-end") {
    val docs = graft.Tables.table(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    val ev = docs.filter(col("doc_id") % 10 === 7)
    val exact = graft.operators.Decontaminate
      .overlaps(train, ev, n = 3, minOverlap = 10)
      .collect().map(_.toSeq).toSet
    val gated = graft.operators.Decontaminate
      .bloomOverlaps(train, ev, n = 3, minOverlap = 10)
      .collect().map(_.toSeq).toSet
    assert(gated === exact)
  }
}
