package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the last §2.4 streaming
  * semantic with per-side state: BOTH join inputs are unbounded, so the
  * engine must buffer each side keyed by the join key and evict by
  * watermark. (q58 covers stream⋈static, q61/q65 windowed state,
  * q62/q63 keyed dedup/custom state; nothing before this held state on
  * two streams at once.)
  *
  * Shape: for every `purchase` event, the `error` events of the SAME
  * user whose event time falls in `[purchase_ts, purchase_ts + 6 h]` —
  * the "errors shortly after a purchase" diagnostic join. (6 hours fits
  * the fixture's density — events span a month, so a minutes-wide
  * window matches nothing; at sf0.1 this yields ~2.3k pairs.) The
  * time-range predicate is what bounds state: with both sides
  * watermarked, Spark derives each side's state horizon from the
  * interval (a purchase can stop waiting once the watermark passes
  * `p_ts + 6 h`; an error once it passes `e_ts`), so per-side state is
  * O(events inside the horizon), not O(stream). Without the range
  * condition the state requirement is unbounded — the interval is
  * load-bearing at 100 TB, not decoration.
  *
  * Inner-join append-mode emissions are exactly the on-time matched
  * pairs; with the bounded harness replay every pair is on-time, so the
  * result equals the batch twin join (the q25/q14 parity argument), and
  * the oracle is that batch SQL.
  */
object StreamStreamJoin {

  /** Equi-key time bucket width — EXACTLY the interval width. State is
    * keyed by (user, bucket), so a probe scans only candidates whose
    * bucket can satisfy the range condition instead of the user's whole
    * buffer. */
  private val BucketUs: Long = 6L * 3600 * 1000000L

  /** (user_id, purchase_id, error_id, delta_us) for error events within
    * six hours after a purchase by the same user. Drained through the
    * executor-parallel file sink.
    *
    * The equi-key is (user, 6-hour time bucket), not user alone. Spark's
    * symmetric hash join stores each side's buffer keyed by the EQUI
    * columns only; the range condition filters AFTER the per-key scan.
    * With a fixed user domain, keying by user makes each probe scan all
    * of that user's buffered rows — per-batch cost Σ_user |P_u|·|E_u|,
    * QUADRATIC in data scale (measured by the 60× probe: 15.2 s at 30×
    * → 82.5 s at 60× on the single-batch bounded replay, output exactly
    * linear). Bucketing by the interval width restores linearity: a
    * match needs `e_ts ∈ [p_ts, p_ts+6h]`, which forces
    * `bucket(p_ts) ∈ {bucket(e_ts)−1, bucket(e_ts)}`, so the error side
    * emits each row under both candidate buckets (2× error state — the
    * price) and every probe touches only temporally-plausible rows.
    * Each pair still matches EXACTLY once (under `bucket(p_ts)`: the
    * two exploded buckets are distinct, and only one equals it). Same
    * trick a batch engine uses to turn an interval join into an
    * equi-join; here it also sizes the per-key state scan. Probed
    * (same rows at every scale): 30× 15.2→6.5 s, 60× 82.5→8.6 s —
    * the quadratic term is gone; what remains is the fixed micro-batch
    * machinery. */
  def purchaseErrorPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Two independent readStream instances: each side of a
    // stream-stream join must be its own source node (a shared one
    // would make the self-join a single-scan plan, not two streams).
    val purchases = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val errors = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user_id"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
    EventStreams.drainToFiles(pairStreams(purchases, errors), "append")
  }

  /** LEFT OUTER face of the same interval join (q222, r13) — the
    * semantics inner join cannot express: purchases with NO error in
    * their 6-hour window must still appear, null-padded. In a
    * stream-stream join that null row can only emit once the engine
    * KNOWS no match can arrive — i.e. when the watermark passes the end
    * of the purchase's match window (p_ts + 6 h). Matched pairs emit
    * immediately (same as q71); null rows emit in the final no-data
    * micro-batch for every purchase whose window the closing watermark
    * (max event ts − the 1 h delay) has passed. Purchases inside the
    * last 7 h of the stream stay buffered forever — by DESIGN, not a
    * bug: the stream cannot prove their negative yet. The oracle is
    * therefore the batch left join RESTRICTED to finalized purchases
    * for its null rows (the q61/q65 finalized-only rule); matched pairs
    * are horizon-free.
    *
    * State shape is q71's: (user, 6 h bucket) equi-key, error side
    * exploded under both candidate buckets (the right-side duplication
    * cannot fabricate a left null row — null emission is keyed by the
    * LEFT row's window alone). */
  def purchaseErrorLeftJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val purchases = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val errors = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user_id"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
    EventStreams.drainToFiles(
      pairStreams(purchases, errors, joinType = "left_outer"), "append")
  }

  /** FULL OUTER face of the interval join (q225, r14) — watermark-proved
    * null emission on BOTH sides: purchases with no error in their 6 h
    * window (q222's rows) AND errors with no purchase in the PRECEDING
    * 6 h, each null-padded once the watermark proves its negative.
    *
    * Deliberately NOT `joinType = "full_outer"` on [[pairStreams]]: the
    * bucket-exploded error side that makes the state scan linear is
    * CORRECT for matched pairs and left nulls (each pair matches exactly
    * once; left-null emission is keyed by the left row alone) but WRONG
    * for right nulls — each error is buffered as TWO state rows, so a
    * truly unmatched error would emit two identical null rows, and an
    * error whose match landed under its OTHER bucket copy would emit a
    * spurious null beside its real pair. A naive full_outer must
    * therefore give up the explode and key state by user alone — which
    * re-opens the quadratic per-user scan the r12 probe measured (82.5 s
    * at 60×). Instead the full outer is composed from two LINEAR-state
    * left-outer joins, the standard decomposition FULL = LEFT ∪ (right
    * anti null-padded): the q222 arm (matched pairs + purchase nulls)
    * plus a MIRRORED arm — errors as the LEFT side against purchases
    * exploded under {bucket(p_ts), bucket(p_ts)+1} (a matching purchase
    * has bucket(p_ts) ∈ {bucket(e_ts)−1, bucket(e_ts)}, so the error's
    * own bucket equals exactly one exploded copy) — keeping ONLY its
    * null rows. Each arm holds the SAME (user, 6 h bucket) equi-key
    * state shape q71 probed linear; the price is two stream-stream
    * queries instead of one, i.e. 2× linear instead of 1× quadratic.
    *
    * An error's negative is proven once the watermark passes e_ts (a
    * matching purchase satisfies p_ts ≤ e_ts, so none can arrive after);
    * errors inside the last hour of the stream stay buffered, exactly
    * like q222's last-7 h purchases. */
  def purchaseErrorFullJoin(spark: SparkSession, sfDir: String): DataFrame = {
    def purchases() = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    def errors() = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user_id"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
    val leftArm = EventStreams.drainToFiles(
      pairStreams(purchases(), errors(), joinType = "left_outer"), "append")
    val rightNulls = EventStreams.drainToFiles(
      errorNullArm(purchases(), errors()), "append")
    leftArm.unionByName(rightNulls)
  }

  /** The mirrored arm of [[purchaseErrorFullJoin]]: errors LEFT OUTER
    * joined to bucket-exploded purchases, reduced to its null rows —
    * the "error with no purchase in the preceding 6 h" face. Null
    * emission is keyed by the LEFT (error) row alone, so the purchase
    * side's 2× state duplication cannot fabricate or double a null
    * (the exact symmetric of q222's argument). Exposed for the
    * Round14 spec, which feeds slice-controlled sides. */
  def errorNullArm(purchases0: DataFrame, errors0: DataFrame): DataFrame = {
    val errors = errors0
      .withWatermark("e_ts", "1 hour")
      .withColumn("e_bkt", expr(s"unix_micros(e_ts) div $BucketUs"))
    val purchases = purchases0
      .withWatermark("p_ts", "1 hour")
      .withColumn("bkt", explode(array(
        expr(s"unix_micros(p_ts) div $BucketUs"),
        expr(s"unix_micros(p_ts) div $BucketUs + 1"))))
    errors.join(purchases,
      col("e_user_id") === col("user_id") &&
        col("e_bkt") === col("bkt") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("interval 6 hours"),
      "left_outer")
      .filter(col("purchase_id").isNull)
      .select(col("e_user_id").as("user_id"),
        lit(null).cast("long").as("purchase_id"),
        col("error_id"), lit(null).cast("long").as("delta_us"))
  }

  /** The join construction alone, over caller-supplied stream sides
    * (purchases: user_id/purchase_id/p_ts; errors: e_user_id/error_id/
    * e_ts) — the SAME code q71 runs, reusable by specs that need to feed
    * slice-controlled file sources to prove restart behavior
    * (StreamStreamRecoverySpec stops it mid-stream and restarts on the
    * checkpoint with new input on BOTH sides). */
  def pairStreams(purchases0: DataFrame, errors0: DataFrame,
                  joinType: String = "inner"): DataFrame = {
    val purchases = purchases0
      .withWatermark("p_ts", "1 hour")
      .withColumn("bkt", expr(s"unix_micros(p_ts) div $BucketUs"))
    val errors = errors0
      .withWatermark("e_ts", "1 hour")
      .withColumn("e_bkt", explode(array(
        expr(s"unix_micros(e_ts) div $BucketUs"),
        expr(s"unix_micros(e_ts) div $BucketUs - 1"))))
    purchases.join(errors,
      col("user_id") === col("e_user_id") &&
        col("bkt") === col("e_bkt") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("interval 6 hours"),
      joinType)
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
  }
}
