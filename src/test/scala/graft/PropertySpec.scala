package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants (SURVEY §5 test plan) over seeded random
  * inputs — deterministic across runs. */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("rolling_hash reference implementation: bounded, deterministic, order-sensitive") {
    def rh(x: String): Long = {
      var h = 0L
      x.getBytes("UTF-8").foreach(b => h = (h * 31L + (b & 0xffL)) % 2147483647L)
      h
    }
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(100)).mkString
      val h = rh(s)
      assert(h >= 0L && h < 2147483647L)
      assert(h === rh(s))
    }
    assert(rh("ab") !== rh("ba"))
    assert(rh("") === 0L)
  }

  test("benefit invariants hold over randomized employee rows") {
    val spark = SparkSpec.session
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val rows = (1 to 100).map { i =>
        (i, 10000 + rnd.nextInt(90000), rnd.nextBoolean(),
          if (rnd.nextBoolean()) Some(rnd.nextInt(40).toLong) else None)
      }
      val df = rows.toDF("id_employee", "gross_salary", "is_valid", "count_activity")
        .withColumn("business_unity", lit("R&D"))
        .withColumn("constract_type", lit("CDI"))
        .withColumn("calculed_distance", lit(null).cast("decimal(10,2)"))
        .withColumn("mean_duration", lit(null).cast("double"))
      val r = graft.domain.Ops.benefitReport(df)
      val bad = r.filter(
        (col("commute_valid") && col("commute_prime") =!= round(col("gross_salary") * 0.05, 2)) ||
        (!col("commute_valid") && col("commute_prime") =!= 0) ||
        col("total_salary") =!= col("gross_salary") + col("commute_prime") ||
        (col("is_valid_activities") && coalesce(col("count_activity"), lit(0L)) < 15))
      assert(bad.isEmpty)
    }
  }

  test("aggregation invariant to input order (A1)") {
    val spark = SparkSpec.session
    val acts = graft.domain.Fixtures.activities(spark, 20, 60)
    // double avg is summation-order-sensitive at the last ulp; compare at
    // a tolerance that is still far tighter than any semantic difference
    def norm(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id_employee"), col("count_activity"), round(col("mean_duration"), 6))
    val a = norm(graft.domain.Ops.aggregateActivities(acts))
    val b = norm(graft.domain.Ops.aggregateActivities(acts.orderBy(rand(7))))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("range join ≡ naive non-equi join over random intervals, any bin width") {
    val spark = SparkSpec.session
    import spark.implicits._
    // random points and variable-length intervals, including zero-length
    // and bin-straddling ones; three bin widths, none aligned to the data
    val points = (1 to 800).map { i =>
      (rnd.nextInt(20), i.toLong, rnd.nextLong(100000L))
    }.toDF("k", "pid", "t")
    val intervals = (1 to 300).map { i =>
      val s = rnd.nextLong(100000L)
      (rnd.nextInt(20), i.toLong, s, s + rnd.nextLong(5000L))
    }.toDF("k", "iid", "s", "e")
    val naive = points.join(intervals.withColumnRenamed("k", "ik"),
        col("k") === col("ik") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    Seq(100L, 1777L, 50000L).foreach { bw =>
      val binned = graft.operators.RangeJoin
        .pointInInterval(points, intervals, "k", "t", "s", "e", binWidth = bw)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned === naive, s"binWidth=$bw diverged")
    }
  }

  test("sign_lsh_codes ≡ composed per-bit DotProductF64 form over random vectors") {
    // the fused kernel's bit-exactness contract: identical accumulation
    // order as the nBits × nTables DotProductF64 composition it replaced
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dim = 16
    val nBits = 4
    val nTables = 3
    val planes = Array.tabulate(nTables * nBits)(i =>
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val vecs = (1 to 60).map { i =>
      (i.toLong, Seq.fill(dim)(rnd.nextLong(1 << 22) - (1 << 21)))
    }.toDF("id", "v")
    val fused = CB.column(graft.functions.SignLshCodes(
      CB.expression(col("v")), planes, nBits))
    val composed = (0 until nTables).map { t =>
      (0 until nBits).map { b =>
        val plane = Literal.create(planes(t * nBits + b),
          ArrayType(DoubleType, containsNull = false))
        val proj = CB.column(graft.functions.DotProductF64(
          CB.expression(col("v")), plane))
        when(proj > 0, shiftleft(lit(1), b)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val rows = vecs.select(fused.as("k"), array(composed: _*).as("c")).collect()
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("nearest_centroids ≡ sqdist sort over random vectors and centroid counts") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val dim = 12
    Seq((5, 2), (8, 8), (3, 1)).foreach { case (k, nProbe) =>
      val cents = Array.fill(k)(Array.fill(dim)(rnd.nextDouble() * 10 - 5))
      val vecs = (1 to 40).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 10 - 5))
      }.toDF("id", "v")
      val got = vecs.select(col("v"),
        CB.column(graft.functions.NearestCentroids(
          CB.expression(col("v")), cents, nProbe)).as("cells"))
        .collect()
      got.foreach { r =>
        val v = r.getSeq[Double](0).toArray
        val expect = (0 until k).map { c =>
          var acc = 0.0
          var j = 0
          while (j < dim) { val d = v(j) - cents(c)(j); acc += d * d; j += 1 }
          (acc, c)
        }.sorted.take(nProbe).map(_._2)
        assert(r.getSeq[Int](1) === expect, s"k=$k nProbe=$nProbe")
      }
    }
  }

  test("shardPack == global prefix sum over random skewed weights, several budgets") {
    val spark = SparkSpec.session
    import spark.implicits._
    (1 to 3).foreach { _ =>
      val n = 300 + rnd.nextInt(200)
      val ids = rnd.shuffle((0 until n).toList).map(_.toLong * 3 + 1)
      // heavy-tailed weights: a few docs dwarf the budget on purpose
      val rows = ids.map(id =>
        (id, if (rnd.nextInt(50) == 0) 10000L else 1L + rnd.nextInt(400)))
      val budget = Seq(500L, 3000L)(rnd.nextInt(2))
      val got = graft.operators.ShardPack
        .pack(rows.toDF("doc_id", "ntok"), col("doc_id"), col("ntok"), budget)
        .select("doc_id", "cum_before", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      var cum = 0L
      val want = rows.sortBy { case (id, _) =>
        (math.floorMod(id * 2654435761L, 1000000007L), id)
      }.map { case (id, w) =>
        val before = cum; cum += w; (id, before, before / budget)
      }.toSet
      assert(got === want, s"n=$n budget=$budget")
    }
  }

  test("globalIndex == driver sort under duplicate order keys and both directions") {
    val spark = SparkSpec.session
    import spark.implicits._
    (1 to 3).foreach { _ =>
      val n = 200 + rnd.nextInt(200)
      val ids = rnd.shuffle((0 until n).toList).map(_.toLong)
      // few distinct weights → massive ties; id is the tiebreak
      val rows = ids.map(id => (id, rnd.nextInt(5).toLong))
      val got = graft.operators.GlobalIndex
        .rank(rows.toDF("id", "v"), col("v").desc, col("id").asc)
        .select("id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = rows.sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> i.toLong }.toMap
      assert(got === want, s"n=$n")
    }
  }

  test("salted join ≡ plain join on skewed data") {
    val spark = SparkSpec.session
    import spark.implicits._
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 1 else i % 50, s"v$i"))
      .toDF("k", "payload") // key 1 is hot
    val small = (1 to 50).map(i => (i, s"dim$i")).toDF("k", "dim")
    val salted = graft.operators.SkewJoin.saltedInnerJoin(big, small, "k")
    val plain = graft.operators.SkewJoin.plainInnerJoin(big, small, "k")
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "dim")
      .exceptAll(plain.select("k", "payload", "dim")).isEmpty)
  }

  test("bloom filter never false-negatives over random key sets and sizings") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    (1 to 5).foreach { round =>
      val n = 50 + rnd.nextInt(2000)
      val numBits = 1 << (6 + rnd.nextInt(10)) // 64 .. 32768 bits
      val numHashes = 1 + rnd.nextInt(6)
      val keys = (0 until n).map(_ => rnd.nextLong())
      val bloom = keys.toDF("k")
        .agg(CB.column(graft.functions.BloomFilterAgg(
          CB.expression(xxhash64(col("k"))), numBits, numHashes)
          .toAggregateExpression()).as("b"))
        .head().getSeq[Long](0).toArray
      val misses = keys.toDF("k").repartition(7)
        .filter(!CB.column(graft.functions.BloomContains(
          CB.expression(xxhash64(col("k"))), bloom, numHashes)))
        .count()
      assert(misses === 0L,
        s"round $round: $misses false negatives at bits=$numBits k=$numHashes n=$n")
    }
  }

  test("freq_items: MG bounds hold over random zipf-ish streams and capacities") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    (1 to 5).foreach { round =>
      val n = 2000 + rnd.nextInt(3000)
      // zipf-ish: item id = floor(sqrt(uniform)) concentrates low ids
      val data = (0 until n).map(_ => s"i${math.sqrt(rnd.nextInt(900)).toInt}")
      val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val k = 4 + rnd.nextInt(40)
      val got = data.toDF("s").repartition(1 + rnd.nextInt(8))
        .agg(CB.column(graft.functions.FreqItemsSketch(
          CB.expression(col("s")), k).toAggregateExpression()).as("f"))
        .select(explode(col("f")).as("e"))
        .select(col("e.item"), col("e.cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got.size <= k)
      got.foreach { case (item, cnt) =>
        val t = truth.getOrElse(item, 0L)
        assert(cnt <= t && cnt >= t - n / (k + 1),
          s"round $round: $item cnt=$cnt true=$t n=$n k=$k")
      }
      truth.filter(_._2 > n / (k + 1)).keys.foreach(hh =>
        assert(got.contains(hh), s"round $round: heavy hitter $hh evicted (k=$k)"))
    }
  }

  test("vector_sum invariant to partitioning over random vectors") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    val dim = 16
    // integer-valued doubles: sums are order-exact, so repartitioning
    // must be bit-invisible
    val rows = (0 until 800).map(_ => Seq.fill(dim)(rnd.nextInt(1000).toDouble))
    def total(parts: Int): Seq[Double] = rows.map(Tuple1(_)).toDF("v")
      .repartition(parts)
      .agg(CB.column(graft.functions.VectorSumAgg(CB.expression(col("v")), dim)
        .toAggregateExpression()).as("s"))
      .head().getSeq[Double](0)
    val want = (0 until dim).map(d => rows.map(_(d)).sum)
    assert(total(1) === want)
    assert(total(13) === want)
  }

  test("BPE learning matches a driver-side reference on random corpora") {
    // the distributed learner vs an independent in-test implementation
    // of the same greedy algorithm (Sennrich merges, leftmost
    // application, count-desc/pair-asc ties): merge tables AND final
    // symbol states must agree exactly on seeded random corpora
    val spark = SparkSpec.session
    import spark.implicits._
    def refBpe(wc: Map[String, Long], k: Int)
        : (Seq[graft.operators.Bpe.Merge], Map[String, List[String]]) = {
      var state: Map[String, List[String]] =
        wc.keys.map(w => w -> w.map(_.toString).toList).toMap
      val merges = scala.collection.mutable.ArrayBuffer.empty[graft.operators.Bpe.Merge]
      var step = 1
      var done = false
      while (step <= k && !done) {
        val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        state.foreach { case (w, syms) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            cnt((p.head, p(1))) += wc(w)
          }
        }
        if (cnt.isEmpty) done = true
        else {
          val ((a, b), c) = cnt.minBy { case ((x, y), n) => (-n, s"$x $y") }
          merges += graft.operators.Bpe.Merge(step, a, b, c)
          state = state.map { case (w, syms) =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            w -> out.toList
          }
          step += 1
        }
      }
      (merges.toSeq, state)
    }
    (1 to 3).foreach { round =>
      val words = (1 to 25 + rnd.nextInt(15)).map { _ =>
        (1 to 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val wc = words.map(w => w -> (1L + rnd.nextInt(20))).toMap
      val docs = wc.toSeq.zipWithIndex.map { case ((w, f), i) =>
        (i.toLong, Seq.fill(f.toInt)(w).mkString(" "))
      }.toDF("doc_id", "text")
      val (gotM, gotState) = graft.operators.Bpe.learn(
        spark, graft.operators.Bpe.wordCounts(docs), k = 6)
      val (wantM, wantState) = refBpe(wc, 6)
      assert(gotM === wantM, s"round $round: merge tables diverge")
      val gotSyms = gotState.collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      val wantSyms = wantState.map { case (w, syms) =>
        w -> syms.map(s => s"|$s|").mkString("")
      }
      assert(gotSyms === wantSyms, s"round $round: final states diverge")
    }
  }

  test("SemDedup with exhaustive probing equals brute force on random vectors") {
    // nProbe >= nClusters makes the cluster path exhaustive: pair sets
    // AND cosines must match VectorSearch.cosineNearDups bit-for-bit
    // on seeded random embeddings, at a random threshold
    val spark = SparkSpec.session
    import spark.implicits._
    (1 to 3).foreach { round =>
      val dim = 4 + rnd.nextInt(4)
      val emb = (0 until 40).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
      }.toDF("vec_id", "embedding")
      val tau = 0.3 + rnd.nextDouble() * 0.5
      val (_, pairs) = graft.operators.SemDedup.prune(
        emb, tau, nClusters = 3, nProbe = 3)
      val got = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      val want = graft.operators.VectorSearch.cosineNearDups(emb, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want, s"round $round (tau=$tau, dim=$dim)")
    }
  }
}
