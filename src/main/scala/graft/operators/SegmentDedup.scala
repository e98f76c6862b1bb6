package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document SEGMENT-level exact deduplication with order-preserving
  * reassembly — the MassiveText/CCNet "remove duplicated paragraphs across
  * documents" stage (Rae et al. 2021 §A.1.2; Wenzek et al. 2019 §3.1). The
  * corpus is cut into non-overlapping k-word segments (the testdata corpus
  * is single-line, so a fixed word window stands in for the paragraph
  * boundary a real corpus would split on — the dataflow is identical);
  * every re-occurrence of a segment already seen earlier in the corpus —
  * in another document OR earlier in the same one — is dropped, and each
  * document is reassembled from its surviving segments in original order.
  *
  * "Earlier" is the total order (doc_id, seg_idx): the globally FIRST
  * occurrence of each distinct segment survives, so output is
  * deterministic under any physical row order and a re-run reproduces it
  * bit-for-bit.
  *
  * Spark-first shape — no UDFs, no windows:
  *   - segmentation is in-row (`transform`/`slice` over the split word
  *     array, whole-stage codegen);
  *   - the first-occurrence relation is a `groupBy(fingerprint).agg(min
  *     (struct(doc_id, seg_idx)))` — partial aggregation collapses a
  *     mega-duplicated segment (license boilerplate repeated 10⁹×) to one
  *     row PER MAP TASK before the shuffle, so segment skew never
  *     concentrates on a reducer (the window-function formulation of
  *     first-wins would ship every occurrence of the hottest segment to
  *     one partition; this shape is why we don't use it);
  *   - occurrences join the first-occurrence relation on the 128-bit md5
  *     FINGERPRINT, not the segment text, so the dedup shuffle moves
  *     16-byte keys where a real corpus' paragraphs are KBs;
  *   - reassembly is one `groupBy(doc_id)` — collect surviving
  *     (seg_idx, seg) structs, `array_sort` in-row, join with spaces.
  *
  * Scale (100 TB): two shuffles of the segment relation (fingerprint,
  * then doc_id) plus the map-side-combined first-occurrence aggregate;
  * everything between them is codegen'd projections. Per-doc state is one
  * document's segments — bounded by max doc length, never by corpus size.
  *
  * Input contract: `doc_id` is unique (two different texts under one id
  * are a broken input either way — [[TextDedup.shingles]]' convention).
  *
  * Reference scope: the reference pipeline has no segment-level dedup
  * (its dedup surface is whole-row SQL DISTINCT); this is part of the
  * training-data extension surface alongside [[TextDedup]] (doc-level
  * exact/MinHash/SimHash) and [[SemDedup]] (embedding-level).
  */
object SegmentDedup {

  /** (doc_id [, carry…], seg_idx, seg): non-overlapping k-word segments in
    * document order. Splits on the whitespace CLASS (`\s+`, matching the
    * round-19 Bpe convention) so tab/newline-joined words segment
    * honestly. A document shorter than k words is one (short) segment;
    * `greatest(…, 1)` keeps a degenerate empty/whitespace-only text as a
    * single empty segment rather than handing `sequence` a negative
    * bound (Spark's `sequence(0, -1)` DESCENDS — it would emit ghost
    * segments, not zero of them). */
  def segments(docs: DataFrame, k: Int = 10, carry: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"segment width must be >= 1, got $k")
    docs
      .select(col("doc_id") +: carry.map(col) :+ split(col("text"), "\\s+").as("w"): _*)
      .select(col("doc_id") +: carry.map(col) :+ posexplode(expr(
        s"""transform(sequence(0, greatest(cast(ceil(size(w) / $k.0) as int) - 1, 0)),
           |          i -> concat_ws(' ', slice(w, i * $k + 1, $k)))""".stripMargin)): _*)
      .withColumnRenamed("pos", "seg_idx")
      .withColumnRenamed("col", "seg")
  }

  /** Segments of [[segments]] marked with `kept`: true iff this occurrence
    * is the globally first (min (doc_id, seg_idx)) for its fingerprint. */
  def markFirst(segs: DataFrame): DataFrame = {
    val fp = segs.withColumn("fp", md5(col("seg")))
    val first = fp
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"))
    fp.join(first, "fp")
      .withColumn("kept",
        col("first.doc_id") === col("doc_id") && col("first.seg_idx") === col("seg_idx"))
      .drop("fp", "first")
  }

  /** The cleaned corpus: per document, the surviving segments reassembled
    * in original order, plus kept/dropped segment counts. A document whose
    * every segment re-occurred earlier survives with empty `clean_text`
    * (the caller decides whether to filter it — dropping the row would
    * silently change corpus membership). */
  def clean(docs: DataFrame, k: Int = 10): DataFrame =
    reassemble(markFirst(segments(docs, k)))

  /** The distinct segment-fingerprint catalog of a corpus — what a
    * production pipeline persists between refreshes so the NEXT batch
    * dedups against history without rescanning it (feed to
    * [[cleanAgainst]]; update by unioning the new batch's catalog and
    * re-distincting). */
  def segmentFingerprints(docs: DataFrame, k: Int = 10): DataFrame =
    segments(docs, k).select(md5(col("seg")).as("fp")).distinct()

  /** INCREMENTAL [[clean]]: dedup a NEW batch against the fingerprint
    * catalog of everything already ingested, plus first-wins within the
    * batch itself — exactly [[clean]]'s output over (history ++ batch)
    * restricted to the batch's documents, bought WITHOUT rescanning
    * history (spec-pinned equivalence). A segment in the catalog drops
    * every batch occurrence (history always wins); a catalog-novel
    * segment keeps its batch-first occurrence. At 100 TB this is the
    * form that matters: each refresh touches only the new batch plus a
    * catalog of 16-byte digests, and the catalog grows by
    * novel-segments only. */
  def cleanAgainst(newDocs: DataFrame, priorFps: DataFrame, k: Int = 10): DataFrame = {
    val segs = segments(newDocs, k).withColumn("fp", md5(col("seg")))
    val firstNew = segs
      .join(priorFps.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"))
    val marked = segs.join(firstNew, Seq("fp"), "left")
      .withColumn("kept", col("first").isNotNull &&
        col("first.doc_id") === col("doc_id") &&
        col("first.seg_idx") === col("seg_idx"))
    reassemble(marked)
  }

  /** Shared reassembly: (doc_id, seg_idx, seg, kept) → one row per doc
    * with survivors rejoined in order plus kept/dropped counts. */
  private def reassemble(marked: DataFrame): DataFrame =
    marked
      .groupBy(col("doc_id"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(" +
          "CASE WHEN kept THEN struct(seg_idx, seg) END)), x -> x.seg)"), " ")
          .as("clean_text"),
        count(when(col("kept"), 1)).as("n_kept"),
        count(when(!col("kept"), 1)).as("n_dropped"))

  /** ExactSubstr-style duplicate SPAN removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §3.2): every sliding L-word window that re-occurs
    * anywhere in the corpus — later doc, or later in the same doc — has
    * all but its globally first occurrence cut out of the text; the
    * union of the non-first windows' token positions is removed and the
    * survivors rejoin in order. The arbitrary-boundary complement of
    * [[clean]] (fixed k-word boundaries): a duplicated region of M ≥ L
    * tokens is covered by its M−L+1 duplicate windows and disappears
    * exactly, wherever it starts; an exact-duplicate document of ≥ L
    * words empties entirely. Documents shorter than L words carry no
    * windows and pass through untouched (the paper's minimum match
    * length).
    *
    * Scale shape: the window relation is ~one row per corpus token but
    * carries only (doc_id, start, 16-byte md5) — the window TEXT never
    * leaves the map side. First-wins is the same map-side-combinable
    * groupBy-min as [[markFirst]]. Coverage comes back to the document
    * as one collect_set per doc (bounded by doc length), and the cut is
    * IN-ROW (`filter` with the index lambda over the split array) — the
    * corpus is never exploded into shuffled token rows. The membership
    * test is linear in the doc's covered-position count, so a
    * pathological fully-covered giant doc pays O(len·|cov|) in its own
    * row; if that profile dominates a corpus, collapse `cov` to merged
    * [start, end) intervals before the join — fewer elements, same
    * dataflow. */
  def spanRemove(docs: DataFrame, L: Int = 20): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    val words = splitWords(docs)
    val wins = windows(words, L)
    val first = wins
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("start"))).as("first"))
    val dupStarts = wins.join(first, "fp")
      .filter(!(col("first.doc_id") === col("doc_id") &&
        col("first.start") === col("start")))
    cutCovered(words, dupStarts, L)
  }

  /** Cross-corpus decontamination by SPAN SCRUBBING: every L-word window
    * of `docs` whose content appears ANYWHERE in `evalDocs` (the
    * benchmark/eval corpus) is cut — all its token positions, every
    * occurrence, no first-occurrence exemption (the training set must
    * not contain the eval text even once; cf. the n-gram overlap
    * decontamination of GPT-3 appendix C / Brown et al. 2020). The
    * removal complement of [[Decontaminate]]'s doc-level flag-and-drop:
    * a 10k-token page quoting one contaminated paragraph loses the
    * paragraph, not the page.
    *
    * Scale shape: eval windows reduce to DISTINCT 16-byte fingerprints
    * (eval corpora are benchmark-sized — MBs against a 100 TB train
    * side — so the LEFT SEMI join's build side is small and Catalyst
    * broadcasts it by stats; past broadcast size it degrades to a
    * shuffled semi join, still linear); everything else is
    * [[spanRemove]]'s dataflow — map-side window fingerprints, doc-keyed
    * coverage, in-row cut. */
  def spanScrub(docs: DataFrame, evalDocs: DataFrame, L: Int = 20): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    val words = splitWords(docs)
    val evalFps = windows(splitWords(evalDocs), L).select(col("fp")).distinct()
    val hits = windows(words, L).join(evalFps, Seq("fp"), "left_semi")
    cutCovered(words, hits, L)
  }

  /** (doc_id, w): the whitespace-class word split both span forms share. */
  private def splitWords(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), "\\s+").as("w"))

  /** (doc_id, start, fp): every sliding L-word window's 128-bit
    * fingerprint; sub-L docs carry no windows. The window TEXT never
    * leaves this projection. */
  private def windows(words: DataFrame, L: Int): DataFrame =
    words
      .filter(size(col("w")) >= L)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $L), s -> md5(concat_ws(' ', slice(w, s + 1, $L))))")))
      .toDF("doc_id", "start", "fp")

  /** Cut the L-token spans at `starts` (doc_id, start, …) out of `words`
    * and reassemble: coverage collapses to ONE position set per doc,
    * the cut is the in-row indexed `filter`, and untouched docs pass
    * through on the left join. */
  private def cutCovered(words: DataFrame, starts: DataFrame, L: Int): DataFrame = {
    val covered = starts
      .select(col("doc_id"),
        explode(expr(s"sequence(start, start + ${L - 1})")).as("pos"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("cov"))
    words.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cov").isNull, array_join(col("w"), " "))
          .otherwise(expr(
            "array_join(filter(w, (x, i) -> NOT array_contains(cov, i)), ' ')"))
          .as("clean_text"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"))
  }

  /** Per-source dedup accounting — the "how much of each source is
    * boilerplate already seen elsewhere" report a corpus build publishes
    * next to its mixing weights. Same first-wins truth as [[clean]]. */
  def stats(docs: DataFrame, k: Int = 10): DataFrame =
    markFirst(segments(docs, k, carry = Seq("source")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_segs"),
        count(when(!col("kept"), 1)).as("n_dropped"),
        (count(when(!col("kept"), 1)).cast("double") / count(lit(1)))
          .as("drop_ratio"))
}
