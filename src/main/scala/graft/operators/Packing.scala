package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the "fill training sequences up to a token
  * budget" step of an LLM data pipeline (first-fit in document order,
  * new bin when the next document would overflow the capacity).
  *
  * The fold is inherently sequential (each document's bin depends on
  * every assignment before it), so it CANNOT be a window function — but
  * it only needs to be sequential WITHIN a packing group. The scalable
  * shape is therefore a keyed fold: `groupByKey(group)` +
  * `flatMapSortedGroups` (Spark sorts each group's iterator for us —
  * no driver collect, no global order). At 100 TB the group key is
  * (domain, shard) so every task folds one bounded shard; here the
  * group is the document's `lang`, matching how pretraining corpora are
  * packed per-domain. One shuffle, keyed by group.
  */
object Packing {

  // NOT private: Dataset encoders generate projection code outside this
  // object's access scope — a private case class fails Janino compile
  // ("Private member cannot be accessed from SpecificSafeProjection").
  case class Doc(doc_id: Long, lang: String, n_chars: Long)
  case class Packed(doc_id: Long, lang: String, n_chars: Long,
                    bin_id: Long)

  case class SpanDoc(shard: Long, pos: Long, doc_id: Long, n_tokens: Long)
  case class SpanPacked(shard: Long, context_id: Long, doc_id: Long,
                        tok_start: Long, tok_end: Long, n_tokens: Long,
                        n_trunc_tokens: Long)

  /** The full training-export packing walk behind q245 (q78's bin
    * assignment, completed to what a loader actually consumes): per
    * shard, walk documents in export order (`pos`) and emit each one's
    * (context_id, tok_start, tok_end) inside a fixed token `budget` —
    * greedy-by-arrival, a new context when the document no longer fits.
    * A document longer than the budget is TRUNCATED to it (the standard
    * pretraining rule; `n_trunc_tokens` reports the loss so the export
    * audit sees it), which also makes the rollover total: a clipped
    * length can never exceed an empty context's capacity.
    *
    * Same scale shape as [[greedyPack]]: the fold is inherently
    * sequential per shard (each span depends on every prior assignment —
    * a window function cannot reference its own output, so there is no
    * running-sum closed form), and exactly as parallel as the export
    * itself — shards pack independently, one keyed shuffle, state is two
    * longs per task. Shard count scales with loader workers at 100 TB
    * (the q99/q221 rule), so per-task work is corpus/shards, never a
    * driver loop. */
  def packSpans(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("shard").cast("long"), col("pos").cast("long"),
        col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[SpanDoc]
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("pos").asc) { (_, it) =>
        var ctx = 0L
        var fill = 0L
        it.map { d =>
          val len = math.min(d.n_tokens, budget)
          if (fill + len > budget) { ctx += 1; fill = 0L }
          val start = fill
          fill += len
          SpanPacked(d.shard, ctx, d.doc_id, start, start + len, len,
            d.n_tokens - len)
        }
      }
      .toDF()
  }

  /** Assign each document a `bin_id` per lang: running greedy first-fit
    * over ascending `doc_id`, opening a new bin when `fill + n_chars`
    * would exceed `capacity` (an oversized first document still lands in
    * a bin of its own — packing must place every document). */
  def greedyPack(docs: DataFrame, capacity: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("lang"),
        col("n_chars").cast("long"))
      .as[Doc]
      .groupByKey(_.lang)
      .flatMapSortedGroups(col("doc_id").asc) { (_, it) =>
        var bin = 0L
        var fill = 0L
        it.map { d =>
          if (fill > 0 && fill + d.n_chars > capacity) { bin += 1; fill = 0L }
          fill += d.n_chars
          Packed(d.doc_id, d.lang, d.n_chars, bin)
        }
      }
      .toDF()
  }
}
