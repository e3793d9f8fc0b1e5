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
