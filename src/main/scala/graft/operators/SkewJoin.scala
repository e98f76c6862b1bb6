package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY "Optimize for scale": skewed
  * keys → salting or AQE skew-join).
  *
  * AQE's skew-join handles most cases at runtime; salting is the
  * plan-level fallback when one side's hot keys would still overwhelm a
  * task (e.g. a power-law user_id in a 100 TB fact table). The big side
  * gets a uniform salt in [0, buckets); the small side is replicated
  * `buckets` times; the join key becomes (key, salt), spreading each hot
  * key over `buckets` tasks at the cost of replicating the small side.
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted into `buckets`
    * sub-keys. Deterministic salt (hash of the whole big row's key + a
    * per-row monotonic component would break joins — salt must only
    * distribute, so any per-row value works; we hash the partition-local
    * row via spark_partition_id + monotonically_increasing_id-free rand
    * alternative: xxhash64 over all big-side columns). */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int = 8): DataFrame = {
    val bigCols = big.columns.map(col).toSeq
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(buckets)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(typedLit((0 until buckets).toList)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Convenience: same result as `big.join(small, key)` — used by specs to
    * prove salting is semantics-preserving. */
  def plainInnerJoin(big: DataFrame, small: DataFrame, key: String): DataFrame =
    big.join(small, Seq(key))
}
