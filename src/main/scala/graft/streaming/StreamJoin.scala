package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (SURVEY §2.8 extension surface): the
  * streaming form of the batch attribution range join
  * (`operators.RangeJoin` / q40) — purchases attributed to a preceding
  * click by the same user within an attribution window.
  *
  * Both sides carry watermarks and the join condition bounds the event-time
  * distance, so Spark can size the state store exactly: a click is held
  * only until `click watermark > purchase time horizon` — state is
  * O(events inside the window), not O(stream). Append mode emits a match
  * exactly once, when both watermarks pass the join window. At 100 TB/day
  * this is the shape that works: state eviction is driven by event time
  * (replay-safe), and the join is keyed on user_id so it shuffles both
  * streams once on the same key.
  */
object StreamJoin {

  /** Purchases joined to the clicks that precede them by at most
    * `windowSeconds`, per user. Input frames must carry
    * (user_id, event_id, ts: timestamp); late rows beyond `watermark` are
    * dropped on either side. */
  def attribution(
      clicks: DataFrame,
      purchases: DataFrame,
      windowSeconds: Long = 3600,
      watermark: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    p.join(c,
      col("p_uid") === col("c_uid") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSeconds SECONDS"),
      "inner")
      .select(col("p_uid").as("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }
}
