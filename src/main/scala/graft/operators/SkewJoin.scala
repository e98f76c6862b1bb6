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
    * sub-keys. The salt only has to distribute rows, never to reproduce,
    * so it is POSITION-only (per-partition row counter): content-derived
    * salts would send IDENTICAL duplicate rows — the common shape of a
    * hot key in log data — to one bucket, leaving the skew unspread,
    * and hashing every row column costs hundreds of bytes of hashing
    * per fact row at 100 TB for no better distribution. Deterministic
    * for a fixed input partitioning. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int = 8): DataFrame = {
    // monotonically_increasing_id's low bits are the per-partition row
    // counter, so consecutive rows round-robin the buckets — but its
    // partition-id HIGH bits are ≡ 0 mod any power-of-two bucket count
    // (counter starts at pid·2^33), so every partition would start its
    // cycle at salt 0 and short partitions would over-fill the low
    // buckets; adding the partition id de-phases the cycles
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id() + spark_partition_id().cast("long"),
        lit(buckets.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(typedLit((0 until buckets).toList)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Convenience: same result as `big.join(small, key)` — used by specs to
    * prove salting is semantics-preserving. */
  def plainInnerJoin(big: DataFrame, small: DataFrame, key: String): DataFrame =
    big.join(small, Seq(key))
}
