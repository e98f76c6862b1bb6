package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => CB}

import graft.functions.{BloomContains, BloomFilterAgg}

/** Runtime-filter semi-join reduction: before a fact⋈dim join whose dim
  * side is selectively filtered, build a Bloom filter over the surviving
  * dim keys (one mergeable aggregate pass) and push it into the fact scan
  * as a plan-constant predicate — fact rows that cannot match never enter
  * the join's shuffle.
  *
  * This is the engine technique Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies when statistics
  * justify it; here it is a first-class, composable operator so a
  * pipeline can apply it deterministically (and CASCADE it: filter orders
  * by the customer bloom, then lineitem by the reduced orders bloom — the
  * classic TPC-H Q3 reduction).
  *
  * Exactness is structural: a Bloom filter has no false negatives, so no
  * matching fact row is dropped; false positives pass the gate and are
  * removed by the exact join that follows. The result is row-identical to
  * the unfiltered plan — only the shuffle volume changes. At 100 TB the
  * fact-side exchange for a 1%-selective dim filter shrinks ~100×, for
  * the price of one broadcast-sized bit array (128 KB at the 2^20
  * default) evaluated inside whole-stage codegen at the scan.
  */
object RuntimeFilter {

  /** The filter handle: build once ([[forKeys]]), apply to any number of
    * fact scans ([[gate]]). */
  final case class KeyBloom(words: Array[Long], numHashes: Int) {
    def gate(key: Column): Column =
      CB.column(BloomContains(CB.expression(xxhash64(key)), words, numHashes))
  }

  /** Smallest power-of-two filter size for an expected dim-side key
    * count: ~16 bits/key at the default 4 hashes gives fpp ≈ 0.24%
    * ((1 − e^(−4/16))^4). The 2^20 default gates well up to ~65k keys;
    * when the caller knows the dim cardinality class (a dimension table's
    * row count is usually a catalog fact, no counting job needed), sizing
    * down shrinks the plan-constant broadcast and sizing up preserves the
    * false-positive rate — a saturated Bloom passes everything and the
    * gate silently stops reducing the shuffle. */
  def numBitsFor(expectedKeys: Long, bitsPerKey: Int = 16): Int = {
    require(expectedKeys > 0 && bitsPerKey > 0,
      s"numBitsFor: expectedKeys=$expectedKeys bitsPerKey=$bitsPerKey")
    // bound BEFORE multiplying: a Long-overflowing product would wrap
    // negative, sail past the budget check, and hand back a tiny
    // saturated filter — the silent pass-everything failure this
    // function exists to prevent
    require(expectedKeys <= (1L << 30) / bitsPerKey,
      s"numBitsFor: $expectedKeys keys × $bitsPerKey bits/key exceeds the " +
        "1 Gib plan-constant budget — partition the build or accept a " +
        "higher fpp with fewer bits/key")
    val want = math.max(1L << 10, expectedKeys * bitsPerKey)
    val bits = java.lang.Long.highestOneBit(want)
    (if (bits == want) bits else bits << 1).toInt
  }

  /** Aggregate the (already-filtered) key column into a Bloom filter.
    * One job; the result is driver-held and broadcast into codegen as a
    * plan constant. Empty input yields the all-zero filter, whose gate
    * rejects everything — consistent with "no dim rows → no join
    * matches". */
  def forKeys(keys: DataFrame, key: Column, numBits: Int = 1 << 20, numHashes: Int = 4): KeyBloom =
    KeyBloom(
      keys.agg(CB.column(
        BloomFilterAgg(CB.expression(xxhash64(key)), numBits, numHashes)
          .toAggregateExpression()).as("bloom"))
        .head().getSeq[Long](0).toArray,
      numHashes)

  /** Convenience: reduce `fact` to rows whose `factKey` might appear in
    * `keys`' `key` column. */
  def bloomSemiReduce(
      fact: DataFrame,
      factKey: Column,
      keys: DataFrame,
      key: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 4): DataFrame =
    fact.filter(forKeys(keys, key, numBits, numHashes).gate(factKey))
}
