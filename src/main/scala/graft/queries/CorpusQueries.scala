package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.operators.{ConnectedComponents, Decontaminate, GlobalIndex, ShardPack, TextDedup}

/** Corpus-hygiene queries (SURVEY §7.1 extension): benchmark
  * decontamination, dedup-cluster formation, and distinctive-term
  * extraction — the operators that close the loop from pairwise similarity
  * hits to an actually-cleaned training corpus.
  */
object CorpusQueries {

  /** Benchmark decontamination: the eval set is the doc_id % 10 = 7 slice
    * of the corpus (a deterministic stand-in for a held-out benchmark);
    * report every train doc sharing ≥ 10 distinct word-3-grams with an
    * eval doc. On this corpus the planted near-dup pairs overlap at ≥ 21
    * shingles while unrelated background pairs top out at 4 — the
    * threshold sits in a wide margin, so the gate is stable across SFs.
    */
  /** Shared by q51 and q63: the two operators are proven to produce the
    * SAME rows (the Bloom gate has no false negatives), so they share one
    * oracle query. */
  private val decontaminationOracle: String = """
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      ev AS (SELECT * FROM sh WHERE doc_id % 10 = 7),
      tr AS (SELECT * FROM sh WHERE doc_id % 10 <> 7)
      SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
             CAST(COUNT(*) AS BIGINT) AS overlap
      FROM tr JOIN ev ON tr.shingle = ev.shingle
      GROUP BY 1, 2
      HAVING COUNT(*) >= 10"""

  val q51Decontamination: Q = Q(
    "q51_decontamination",
    Some(decontaminationOracle),
    headline = true) { (spark, dir) =>
    // spread (guide §2.5): tokenize + shingle kernel fuse into the scan
    val docs = graft.Tables.tableSpread(spark, dir, "documents", col("doc_id"))
    Decontaminate.overlaps(
      train = docs.filter(col("doc_id") % 10 =!= 7),
      eval = docs.filter(col("doc_id") % 10 === 7),
      n = 3, minOverlap = 10)
  }

  /** Bloom-gated decontamination (q63): q51's exact result via a
    * scan-level prefilter. The eval set's shingles build a Bloom filter
    * (one aggregate pass, bitwise-OR mergeable) that rides the training
    * scan as a plan constant inside whole-stage codegen; only docs whose
    * in-row distinct-shingle hit count could reach the overlap threshold
    * enter the shingle-join verify. No false negatives (Bloom property),
    * so the oracle is the SAME query as q51 — the gate is pure pruning.
    */
  val q63BloomDecontamination: Q = Q(
    "q63_bloom_decontamination",
    Some(decontaminationOracle),
    headline = true) { (spark, dir) =>
    // spread (guide §2.5): the Bloom-gated scan IS the heavy stage
    val docs = graft.Tables.tableSpread(spark, dir, "documents", col("doc_id"))
    Decontaminate.bloomOverlaps(
      train = docs.filter(col("doc_id") % 10 =!= 7),
      eval = docs.filter(col("doc_id") % 10 === 7),
      n = 3, minOverlap = 10)
  }

  /** Dedup-cluster formation: near-dup edges from the production MinHash-
    * LSH path (q19 — oracle-identical to exact all-pairs on this corpus),
    * closed into components by iterative min-label propagation. Output is
    * per-doc cluster membership (component id = min doc id in the cluster
    * = the canonical survivor) plus cluster size. The DuckDB oracle
    * computes the same closure with a recursive CTE over the exact-Jaccard
    * edge set.
    */
  val q52DedupClusters: Q = Q(
    "q52_dedup_clusters",
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      e AS (
        SELECT it.a_id, it.b_id FROM inter it
        JOIN sz sa ON it.a_id = sa.doc_id
        JOIN sz sb ON it.b_id = sb.doc_id
        WHERE it.i / (sa.n + sb.n - it.i) >= 0.5),
      und AS (SELECT a_id AS u, b_id AS v FROM e UNION SELECT b_id, a_id FROM e),
      reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u),
      comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component_id FROM reach GROUP BY u)
      SELECT c.doc_id, c.component_id, s.csize
      FROM comp c
      JOIN (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS csize
            FROM comp GROUP BY 1) s USING (component_id)"""),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19): ABA-ordered bench A/B reads plain
    // 1.30-1.73 vs spread 1.87 (same verdict as q19 — the shared
    // minhashPairs path does not profit from the spread at the bench)
    val edges = TextDedup
      .minhashPairs(table(spark, dir, "documents"), n = 3, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    ConnectedComponents.dedupClusters(edges)
  }

  /** Distinctive-term extraction, integer-exact (no float idf): per doc,
    * the top-3 terms ranked by term frequency DESC, document frequency ASC
    * (rarer across the corpus = more distinctive), term ASC — a total
    * order, so the result is deterministic across engines. The tf-idf
    * SHAPE (per-doc tf join corpus-wide df) with none of the
    * transcendental-float hazards.
    */
  val q53DistinctiveTerms: Q = Q(
    "q53_distinctive_terms",
    Some("""
      WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
                 FROM documents),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM w GROUP BY 1, 2),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      r AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(row_number() OVER (
                 PARTITION BY tf.doc_id
                 ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS INTEGER) AS rnk
        FROM tf JOIN df USING (term))
      SELECT doc_id, term, tf, df, rnk FROM r WHERE rnk <= 3""")) { (spark, dir) =>
    val w = table(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = w.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
  }

  /** Dedup APPLIED: the cleaned corpus after near-dup clustering — every
    * doc survives unless it is a non-canonical member of a q52 cluster
    * (canonical = min doc id). This is the operator a pipeline actually
    * runs: pairs → clusters → anti-join, one linear pass over the corpus
    * at the end. Output carries length(text) so the hash gate pins that
    * the SURVIVING TEXTS (not just ids) match.
    */
  val q54DedupApply: Q = Q(
    "q54_dedup_apply",
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      e AS (
        SELECT it.a_id, it.b_id FROM inter it
        JOIN sz sa ON it.a_id = sa.doc_id
        JOIN sz sb ON it.b_id = sb.doc_id
        WHERE it.i / (sa.n + sb.n - it.i) >= 0.5),
      und AS (SELECT a_id AS u, b_id AS v FROM e UNION SELECT b_id, a_id FROM e),
      reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u),
      comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component_id FROM reach GROUP BY u)
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars_kept
      FROM documents d
      WHERE d.doc_id NOT IN
        (SELECT doc_id FROM comp WHERE doc_id <> component_id)""")) { (spark, dir) =>
    val docs = table(spark, dir, "documents")
    val edges = TextDedup.minhashPairs(docs, n = 3, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    val redundant = ConnectedComponents.components(edges)
      .filter(col("id") =!= col("component_id"))
      .select(col("id").as("doc_id"))
    docs.join(redundant, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_kept"))
  }

  /** Shard packing (q55): deterministic hash-order permutation of the
    * corpus cut into contiguous ~10k-token shards via [[ShardPack]]'s
    * two-phase distributed prefix sum. The DuckDB oracle computes the SAME
    * assignment with one global window — proving the distributed
    * decomposition is exact, not approximately equal.
    */
  val q55ShardPack: Q = Q(
    "q55_shard_pack",
    Some("""
      WITH d AS (
        SELECT doc_id,
               (CAST(doc_id AS HUGEINT) * 2654435761) % 1000000007 AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        FROM documents),
      c AS (
        SELECT doc_id, ntok,
               CAST(COALESCE(SUM(ntok) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM d)
      SELECT doc_id, ntok, cum_before,
             CAST(cum_before // 10000 AS BIGINT) AS shard
      FROM c"""),
    headline = true) { (spark, dir) =>
    // pack scans its input twice (bucket offsets + main pass) and the
    // weight is the expensive tokenize — persist the NARROW projection
    // (16 B/doc), exactly the "persist the projected input" move the
    // operator's 100 TB note prescribes, so the corpus text is read and
    // split once, not twice
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ShardPack.pack(d, col("doc_id"), col("ntok"), budget = 10000L)
      .select(col("doc_id"), col("ntok"), col("cum_before"), col("shard"))
  }

  /** Concat-and-cut sequence packing (q102): the corpus as ONE token
    * stream in deterministic hash order, cut every 2048 tokens into
    * training sequences with documents STRADDLING cuts —
    * [[graft.operators.SequencePack.spans]], the GPT-style pack q55's
    * no-split shards deliberately are not. The result is the span
    * manifest (doc × sequence → token range + in-sequence offset); the
    * DuckDB oracle recomputes every span from one global window +
    * generate_series, so the gate proves the distributed prefix sum and
    * the straddle arithmetic are EXACT, row for row. Tiling invariants
    * (each sequence covered [0, 2048) exactly; each document's spans
    * concatenate to [0, ntok)) are require-asserted Spark-side. */
  val q102SequencePack: Q = Q(
    "q102_sequence_pack",
    Some("""
      WITH d AS (
        SELECT doc_id,
               (CAST(doc_id AS HUGEINT) * 2654435761) % 1000000007 AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        FROM documents),
      c AS (
        SELECT doc_id, ntok,
               CAST(COALESCE(SUM(ntok) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum
        FROM d)
      SELECT doc_id,
             CAST(s AS BIGINT) AS seq,
             CAST(GREATEST(0, s * 2048 - cum) AS BIGINT) AS doc_lo,
             CAST(LEAST(ntok, (s + 1) * 2048 - cum) AS BIGINT) AS doc_hi,
             CAST(GREATEST(0, cum - s * 2048) AS BIGINT) AS seq_off
      FROM c, UNNEST(range(cum // 2048, (cum + ntok - 1) // 2048 + 1)) AS t(s)
      WHERE ntok > 0"""),
    headline = true) { (spark, dir) =>
    val seqLen = 2048L
    // narrow-projection persist: same rationale as q55 (pack reads its
    // input twice; the tokenize must run once)
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the span manifest feeds THREE consumers — both tiling-invariant
    // checks and the returned rows; unpersisted, the whole prefix-sum
    // pipeline re-ran once per consumer (measured 3× the q55 cost for
    // the same prefix sum). The checks now also assert over the SAME
    // materialized rows the query returns.
    val spans = graft.operators.SequencePack.spans(d, col("doc_id"), col("ntok"), seqLen)
      .select(col("doc_id"), col("seq"), col("doc_lo"), col("doc_hi"),
        col("seq_off"), col("ntok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tiling invariants: sequences tile [0, seqLen) exactly (last may be
    // short); each document's spans concatenate to [0, ntok)
    val seqCheck = spans.groupBy(col("seq"))
      .agg(sum(col("doc_hi") - col("doc_lo")).as("w"),
        min(col("seq_off") - lit(0)).as("mn"))
      .agg(max(col("seq")).as("last"),
        count(when(col("w") =!= seqLen, 1)).as("short"),
        min(col("mn")).as("negOff")).head()
    require(seqCheck.getLong(1) <= 1L,
      s"q102: only the final sequence may be short, got ${seqCheck.getLong(1)}")
    require(seqCheck.getLong(2) >= 0L, "q102: negative in-sequence offset")
    val docCheck = spans.groupBy(col("doc_id"), col("ntok"))
      .agg(sum(col("doc_hi") - col("doc_lo")).as("covered"),
        min(col("doc_lo")).as("lo"), max(col("doc_hi")).as("hi"))
      .filter(col("covered") =!= col("ntok") || col("lo") =!= 0 ||
        col("hi") =!= col("ntok"))
    require(docCheck.isEmpty, "q102: document spans must tile [0, ntok)")
    spans.drop("ntok")
  }

  /** The whole hygiene pipeline composed end-to-end (q56): near-dup dedup
    * applied (q54) → benchmark decontamination against the eval slice
    * (q51, and the eval slice itself excluded from the training corpus) →
    * deterministic shard packing (q55). One library call per stage, one
    * oracle for the final artifact: the shard layout of the cleaned
    * corpus. This is the "does it compose" proof for the corpus-hygiene
    * family, same rationale as q46 for the sampling family.
    */
  val q56CorpusPipeline: Q = Q(
    "q56_corpus_pipeline",
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      e AS (
        SELECT it.a_id, it.b_id FROM inter it
        JOIN sz sa ON it.a_id = sa.doc_id
        JOIN sz sb ON it.b_id = sb.doc_id
        WHERE it.i / (sa.n + sb.n - it.i) >= 0.5),
      und AS (SELECT a_id AS u, b_id AS v FROM e UNION SELECT b_id, a_id FROM e),
      reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u),
      comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component_id FROM reach GROUP BY u),
      tr AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 10 <> 7
          AND doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component_id)),
      cont AS (
        SELECT DISTINCT t.doc_id FROM (
          SELECT a.doc_id, b.doc_id AS eval_id
          FROM sh a JOIN sh b ON a.shingle = b.shingle
          WHERE a.doc_id IN (SELECT doc_id FROM tr) AND b.doc_id % 10 = 7
          GROUP BY 1, 2 HAVING COUNT(*) >= 10) t),
      d AS (
        SELECT doc_id,
               (CAST(doc_id AS HUGEINT) * 2654435761) % 1000000007 AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM tr)
          AND doc_id NOT IN (SELECT doc_id FROM cont)),
      c AS (
        SELECT doc_id, ntok,
               CAST(COALESCE(SUM(ntok) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM d)
      SELECT doc_id, ntok, cum_before,
             CAST(cum_before // 10000 AS BIGINT) AS shard
      FROM c""")) { (spark, dir) =>
    val docs = table(spark, dir, "documents")
    // ONE corpus shingle pass feeds every stage: shingle sets are row-
    // local, so slicing the persisted relation by doc id IS shingling
    // the slice (the equivalence the oracle SQL uses)
    val sh = TextDedup.shingles(docs, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stage 1: near-dup dedup, applied
    val edges = TextDedup.minhashPairsFromShingles(sh, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    val redundant = ConnectedComponents.components(edges)
      .filter(col("id") =!= col("component_id"))
      .select(col("id").as("doc_id"))
    val survivors = docs.join(redundant, Seq("doc_id"), "left_anti")
    // stage 2: decontamination — eval slice is the benchmark stand-in;
    // the training corpus excludes it AND anything overlapping it
    val train = survivors.filter(col("doc_id") % 10 =!= 7)
    val trainSh = sh.join(train.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val evalSh = sh.filter(col("doc_id") % 10 === 7)
    val contaminated = Decontaminate.overlapsAgainst(trainSh, evalSh, minOverlap = 10)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 3: deterministic shard layout of what remains
    val d = clean.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    ShardPack.pack(d, col("doc_id"), col("ntok"), budget = 10000L)
      .select(col("doc_id"), col("ntok"), col("cum_before"), col("shard"))
  }

  /** Global 0-based index in an arbitrary total order (q57): documents
    * ranked longest-first — stable global example ids via
    * [[GlobalIndex]]'s range-partition + per-partition window + offset
    * join, never a single-partition sort. The DuckDB oracle is the
    * naive global row_number.
    */
  val q57GlobalIndex: Q = Q(
    "q57_global_index",
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
                 FROM documents)
      SELECT doc_id, ntok,
             CAST(row_number() OVER (ORDER BY ntok DESC, doc_id) - 1
               AS BIGINT) AS gidx
      FROM d"""),
    headline = true) { (spark, dir) =>
    // NO spread (measured, round 19; in-JVM alternating A/B: 0.82-1.13
    // plain vs 0.97-1.26 spread warm): GlobalIndex's range partitioning
    // SAMPLES its child — every extra pass repays the exchange; same
    // verdict for the q55/q102 prefix-sum passes (0.61-0.66 vs
    // 1.07-1.22 and 0.57-0.68 vs 1.01-1.29)
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
    GlobalIndex.rank(d, col("ntok").desc, col("doc_id").asc)
      .select(col("doc_id"), col("ntok"), col("rank").as("gidx"))
  }

  /** Z-order clustering key (q58): the Morton interleave of (user bucket,
    * hour bucket) over events — the value the layout pass
    * ([[graft.operators.ZOrder.layout]]) range-partitions on. The DuckDB
    * oracle replays the identical shift/mask bit-spread, pinning the
    * clustering key bit-for-bit; the file-statistics locality win is
    * spec-asserted in ZOrderSpec.
    */
  val q58Zorder: Q = Q(
    "q58_zorder",
    Some("""
      WITH e AS (
        SELECT event_id, user_id % 1024 AS a,
               (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 1024 AS b
        FROM events),
      s1 AS (SELECT event_id, a, b,
               (a | (a << 16)) & 281470681808895 AS xa,
               (b | (b << 16)) & 281470681808895 AS xb FROM e),
      s2 AS (SELECT event_id, a, b,
               (xa | (xa << 8)) & 71777214294589695 AS xa,
               (xb | (xb << 8)) & 71777214294589695 AS xb FROM s1),
      s3 AS (SELECT event_id, a, b,
               (xa | (xa << 4)) & 1085102592571150095 AS xa,
               (xb | (xb << 4)) & 1085102592571150095 AS xb FROM s2),
      s4 AS (SELECT event_id, a, b,
               (xa | (xa << 2)) & 3689348814741910323 AS xa,
               (xb | (xb << 2)) & 3689348814741910323 AS xb FROM s3),
      s5 AS (SELECT event_id, a, b,
               (xa | (xa << 1)) & 6148914691236517205 AS xa,
               (xb | (xb << 1)) & 6148914691236517205 AS xb FROM s4)
      SELECT event_id, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(xa | (xb << 1) AS BIGINT) AS z
      FROM s5""")) { (spark, dir) =>
    import graft.operators.ZOrder
    table(spark, dir, "events")
      .select(col("event_id"),
        (col("user_id") % 1024).as("a"),
        (expr("ts div 3600000000000") % 1024).as("b"))
      .withColumn("z", ZOrder.zvalue(col("a"), col("b")))
  }

  /** Novelty / memorization-risk metric (q61): per doc, how much of its
    * content is UNIQUE to it — shingles with corpus document-frequency 1
    * vs the doc's total distinct shingles. Boilerplate-heavy docs score
    * near 0, genuinely novel content near its size. Counts, not ratios,
    * so the gate is integer-exact.
    */
  val q61Novelty: Q = Q(
    "q61_novelty",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1)
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
      FROM sh JOIN df USING (shingle)
      GROUP BY 1""")) { (spark, dir) =>
    val sh = TextDedup.shingles(table(spark, dir, "documents"), 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(df, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
  }

  /** Corpus-composition report (q62): per source, total docs and how many
    * are redundant near-dup cluster members — the dedup-rate rollup a
    * corpus audit reads before deciding what to crawl less of.
    */
  val q62DedupRate: Q = Q(
    "q62_dedup_rate",
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      e AS (
        SELECT it.a_id, it.b_id FROM inter it
        JOIN sz sa ON it.a_id = sa.doc_id
        JOIN sz sb ON it.b_id = sb.doc_id
        WHERE it.i / (sa.n + sb.n - it.i) >= 0.5),
      und AS (SELECT a_id AS u, b_id AS v FROM e UNION SELECT b_id, a_id FROM e),
      reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u),
      comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component_id FROM reach GROUP BY u)
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_redundant
      FROM documents d
      LEFT JOIN (SELECT doc_id FROM comp WHERE doc_id <> component_id) c
        USING (doc_id)
      GROUP BY 1""")) { (spark, dir) =>
    val docs = table(spark, dir, "documents")
    val edges = TextDedup.minhashPairs(docs, n = 3, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    val redundant = ConnectedComponents.components(edges)
      .filter(col("id") =!= col("component_id"))
      .select(col("id").as("doc_id"), lit(1L).as("red"))
    docs.join(redundant, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("red"), lit(0L))).as("n_redundant"))
  }

  /** Cross-corpus fuzzy join (q65): near-dup pairs between the "new
    * crawl" (the doc_id % 10 = 7 slice) and the existing corpus — the
    * batch form of incremental-ingest dedup. Candidates from cross-corpus
    * MinHash-LSH band buckets, exact-Jaccard verified, so the oracle is
    * the exact cross-relation all-pairs join: no false positives by
    * construction, and no misses because the corpus margin (pinned in
    * OperatorsSpec) keeps every j ≥ 0.5 pair above j = 0.85, where
    * detection probability is ≥ 0.99999. */
  val q65FuzzyJoin: Q = Q(
    "q65_fuzzy_join",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      l AS (SELECT * FROM sh WHERE doc_id % 10 = 7),
      r AS (SELECT * FROM sh WHERE doc_id % 10 <> 7),
      lsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM l GROUP BY 1),
      rsz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM r GROUP BY 1),
      inter AS (
        SELECT l.doc_id AS left_id, r.doc_id AS right_id,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM l JOIN r ON l.shingle = r.shingle
        GROUP BY 1, 2)
      SELECT it.left_id, it.right_id,
             it.i / (sl.n + sr.n - it.i) AS jaccard
      FROM inter it
      JOIN lsz sl ON it.left_id = sl.doc_id
      JOIN rsz sr ON it.right_id = sr.doc_id
      WHERE it.i / (sl.n + sr.n - it.i) >= 0.5"""),
    headline = true) { (spark, dir) =>
    // spread (guide §2.5): tokenize + shingle kernel fuse into the scan.
    // Round-20 ABA re-confirm (r19 watch list): spread 1.029/1.089 vs
    // plain 1.466/1.269 in two drift-bracketed boards — keep holds.
    val docs = graft.Tables.tableSpread(spark, dir, "documents", col("doc_id"))
    TextDedup.minhashJoin(
      left = docs.filter(col("doc_id") % 10 === 7),
      right = docs.filter(col("doc_id") % 10 =!= 7),
      n = 3, minJaccard = 0.5)
  }

  /** Leakage-free train/val/test split (q66): the split gate hashes the
    * near-dup CLUSTER canonical (q52's component id; unclustered docs are
    * their own canonical), so a document and its near-twin can never
    * straddle splits — the standard benchmark-leakage defence a per-doc
    * hash split lacks. Oracle = q52's recursive-CTE closure composed with
    * q45's portable-hash gate, entirely in SQL. 10% test / 10% val. */
  val q66LeakFreeSplit: Q = Q(
    "q66_leakfree_split",
    Some("""
      WITH RECURSIVE
      tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      pos AS (SELECT doc_id, w, UNNEST(range(1, len(w) - 1)) AS i
              FROM tok WHERE len(w) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
             FROM pos),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      e AS (
        SELECT it.a_id, it.b_id FROM inter it
        JOIN sz sa ON it.a_id = sa.doc_id
        JOIN sz sb ON it.b_id = sb.doc_id
        WHERE it.i / (sa.n + sb.n - it.i) >= 0.5),
      und AS (SELECT a_id AS u, b_id AS v FROM e UNION SELECT b_id, a_id FROM e),
      reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u),
      comp AS (
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component_id FROM reach GROUP BY u),
      canon AS (
        SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS canon
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
      SELECT doc_id, canon,
             CASE WHEN ((CAST(canon AS HUGEINT) * 2654435761) % 1000000007) % 1000 < 100 THEN 'test'
                  WHEN ((CAST(canon AS HUGEINT) * 2654435761) % 1000000007) % 1000 < 200 THEN 'val'
                  ELSE 'train' END AS split
      FROM canon"""),
    headline = true) { (spark, dir) =>
    import graft.operators.Sampling
    // NO spread (measured, round 19): ABA-ordered bench A/B is a wash
    // (plain 1.37-1.83 vs spread 1.60) — not shipped without a win
    val docs = table(spark, dir, "documents")
    val edges = TextDedup.minhashPairs(docs, n = 3, minJaccard = 0.5)
      .select(col("a_id"), col("b_id"))
    Sampling.leakFreeSplit(
      docs.select(col("doc_id")),
      ConnectedComponents.components(edges)
        .select(col("id").as("doc_id"), col("component_id")),
      valPermille = 100, testPermille = 100)
  }

  /** Curriculum binning (q69): docs ranked by a difficulty proxy (token
    * count) in a deterministic total order and cut into 4 equal-depth
    * bins — the "short-to-long curriculum" a training scheduler consumes.
    * A naive `ntile(4) OVER (ORDER BY ...)` is a SINGLE-PARTITION global
    * sort; here the rank comes from [[GlobalIndex]] (range partition +
    * per-partition window + broadcast offsets — both exchanges linear)
    * and the bin is pure arithmetic on (rank, N), which equals ntile's
    * equal-depth cut exactly when 4 divides N and differs at most in the
    * boundary rounding rule otherwise — the oracle computes the SAME
    * floor(rank·4/N) rule, so the gate is exact either way. */
  val q69CurriculumBins: Q = Q(
    "q69_curriculum_bins",
    Some("""
      WITH d AS (SELECT doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
                 FROM documents),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
      r AS (SELECT doc_id, ntok,
                   CAST(row_number() OVER (ORDER BY ntok, doc_id) - 1 AS BIGINT) AS rank
            FROM d)
      SELECT r.doc_id, r.ntok, r.rank,
             CAST((r.rank * 4) // n.n AS BIGINT) AS bin
      FROM r, n"""),
    headline = false) { (spark, dir) =>
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
    // total N rides along from GlobalIndex's own per-partition counts —
    // no separate d.count() job re-running the scan
    GlobalIndex.rankWithTotal(d, col("ntok").asc, col("doc_id").asc)
      .withColumn("bin", expr("(rank * 4L) div total"))
      .select(col("doc_id"), col("ntok"), col("rank"), col("bin"))
  }

  /** One-pass per-column profile of `documents` (q71): the trust-a-new-
    * drop report — counts, nulls, exact distincts, lexicographic min/max
    * — via in-row `stack` unpivot + one grouped aggregate. */
  val q71Profile: Q = Q(
    "q71_profile",
    Some("""
      WITH s AS (
        SELECT 'doc_id' AS "column", CAST(doc_id AS VARCHAR) AS value FROM documents
        UNION ALL SELECT 'text', text FROM documents
        UNION ALL SELECT 'lang', lang FROM documents
        UNION ALL SELECT 'source', source FROM documents
        UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
      SELECT "column",
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(value) AS BIGINT) AS n_non_null,
             CAST(COUNT(DISTINCT value) AS BIGINT) AS n_distinct,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM s GROUP BY 1""")) { (spark, dir) =>
    graft.operators.Profile.profile(
      table(spark, dir, "documents"),
      Seq("doc_id", "text", "lang", "source", "n_chars"),
      exactDistinct = true)
  }

  /** Drift report (q74): the q71 profile computed for two corpus drops
    * (the doc_id parity halves stand in for yesterday/today) and joined
    * per column — the check a pipeline runs before accepting a new drop:
    * did null rates or cardinalities move? All-integer output, so the
    * gate is exact; at scale this is two profile passes + a |columns|-row
    * join. */
  val q74ProfileDrift: Q = Q(
    "q74_profile_drift",
    Some("""
      WITH sa AS (
        SELECT 'lang' AS "column", lang AS value FROM documents WHERE doc_id % 2 = 0
        UNION ALL SELECT 'source', source FROM documents WHERE doc_id % 2 = 0
        UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents WHERE doc_id % 2 = 0),
      sb AS (
        SELECT 'lang' AS "column", lang AS value FROM documents WHERE doc_id % 2 = 1
        UNION ALL SELECT 'source', source FROM documents WHERE doc_id % 2 = 1
        UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents WHERE doc_id % 2 = 1),
      pa AS (SELECT "column", CAST(COUNT(*) AS BIGINT) AS n_a,
                    CAST(COUNT(DISTINCT value) AS BIGINT) AS nd_a
             FROM sa GROUP BY 1),
      pb AS (SELECT "column", CAST(COUNT(*) AS BIGINT) AS n_b,
                    CAST(COUNT(DISTINCT value) AS BIGINT) AS nd_b
             FROM sb GROUP BY 1)
      SELECT pa."column", pa.n_a, pb.n_b, pa.nd_a, pb.nd_b,
             pa.nd_a - pb.nd_b AS distinct_drift
      FROM pa JOIN pb ON pa."column" = pb."column""""),
    headline = false) { (spark, dir) =>
    import graft.operators.Profile
    val docs = table(spark, dir, "documents")
    val cols = Seq("lang", "source", "n_chars")
    val a = Profile.profile(docs.filter(pmod(col("doc_id"), lit(2)) === 0), cols,
        exactDistinct = true)
      .select(col("column"), col("n_rows").as("n_a"), col("n_distinct").as("nd_a"))
    val b = Profile.profile(docs.filter(pmod(col("doc_id"), lit(2)) === 1), cols,
        exactDistinct = true)
      .select(col("column"), col("n_rows").as("n_b"), col("n_distinct").as("nd_b"))
    a.join(b, "column")
      .select(col("column"), col("n_a"), col("n_b"), col("nd_a"), col("nd_b"),
        (col("nd_a") - col("nd_b")).as("distinct_drift"))
  }

  /** Token-budget mix building (q75): per source, keep documents in the
    * deterministic portable-hash order until a TOKEN budget is filled —
    * how a pretraining mix is actually specified ("800 tokens of each
    * source"), vs q50's row-count quota — the budget is small enough
    * that the cutoff actually filters at sf0.01, so the oracle catches
    * cumsum-order bugs. One shuffle keyed on source;
    * the running sum is a per-stratum ROWS window (bounded per group —
    * for giant strata decompose like ShardPack). The same-hash-order
    * property as the other gates: adding documents to a source only
    * displaces the highest-hash tail, the selected prefix is stable. */
  val q75TokenBudgetMix: Q = Q(
    "q75_token_budget_mix",
    Some("""
      WITH d AS (SELECT doc_id, source,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                        ((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000007) AS h
                 FROM documents),
      c AS (SELECT doc_id, source, ntok,
                   CAST(SUM(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_tokens
            FROM d)
      SELECT doc_id, source, ntok, cum_tokens
      FROM c WHERE cum_tokens <= 800""")) { (spark, dir) =>
    import graft.operators.Sampling
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        Sampling.portableHash(col("doc_id")).as("h"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum_tokens", sum(col("ntok")).over(w))
      .filter(col("cum_tokens") <= 800)
      .select(col("doc_id"), col("source"), col("ntok"), col("cum_tokens"))
  }

  /** Temperature-½ source rebalancing (q78): the pretraining mix knob —
    * keep-rate per source ∝ sqrt(1/source token total), rarest source
    * kept whole ([[Sampling.temperatureMixSqrt]]). Deterministic: the
    * portable-hash gate + sqrt/floor threshold are bit-identical across
    * engines, so the selected set is re-derivable anywhere. */
  val q78TemperatureMix: Q = Q(
    "q78_temperature_mix",
    Some("""
      WITH d AS (SELECT doc_id, source,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                        ((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000007) AS h
                 FROM documents),
      t AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS w FROM d GROUP BY 1),
      mn AS (SELECT CAST(MIN(w) AS BIGINT) AS wmin FROM t),
      th AS (SELECT source,
                    CAST(FLOOR(sqrt(CAST(mn.wmin AS DOUBLE) / CAST(w AS DOUBLE))
                               * 1000000007.0) AS BIGINT) AS thr
             FROM t, mn)
      SELECT d.doc_id, d.source, d.ntok
      FROM d JOIN th ON d.source IS NOT DISTINCT FROM th.source
      WHERE d.h < th.thr""")) { (spark, dir) =>
    import graft.operators.Sampling
    val d = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        Sampling.portableHash(col("doc_id")).as("h"))
    Sampling.temperatureMixSqrt(d, col("h"), col("source"), col("ntok"))
      .select(col("doc_id"), col("source"), col("ntok"))
  }

  val all: Seq[Q] = Seq(q51Decontamination, q52DedupClusters, q53DistinctiveTerms,
    q54DedupApply, q55ShardPack, q56CorpusPipeline, q57GlobalIndex, q58Zorder,
    q61Novelty, q62DedupRate, q63BloomDecontamination, q65FuzzyJoin,
    q66LeakFreeSplit, q69CurriculumBins, q71Profile, q74ProfileDrift,
    q75TokenBudgetMix, q78TemperatureMix, q102SequencePack)
}
