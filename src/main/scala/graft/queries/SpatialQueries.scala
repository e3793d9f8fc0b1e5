package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.BBoxOps

/** Spatial / detection post-processing surface: pairwise IoU and greedy
  * NMS over the BBox model, plus the HLL approx-distinct extension
  * (SURVEY.md §2.4). Detections are synthesized deterministically from
  * events so the operators run at every SF without model weights.
  */
object SpatialQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Pairwise IoU of boxes within a frame: the join is keyed by frame,
    // so pair blow-up stays bounded per group and shuffles stay keyed.
    // Frames are event_id div 50 — constant 50 detections/frame at every
    // SF, so pair count grows linearly with the data (VERDICT r1 #8).
    "q36_bbox_iou" -> { (s, d) =>
      val boxes = BBoxOps.syntheticBoxes(Tables.events(s, d), 50)
        .select("frame", "box_id", "x0", "y0", "x1", "y1")
      val a = boxes.toDF("frame", "id_a", "ax0", "ay0", "ax1", "ay1")
      val b = boxes.toDF("frame", "id_b", "bx0", "by0", "bx1", "by1")
      a.join(b, Seq("frame"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("iou", BBoxOps.iou(
          col("ax0"), col("ay0"), col("ax1"), col("ay1"),
          col("bx0"), col("by0"), col("bx1"), col("by1")))
        .filter(col("iou") >= 0.2)
        .select("frame", "id_a", "id_b", "iou")
        .orderBy("frame", "id_a", "id_b")
    },

    // Greedy NMS per frame (sequential in-group, parallel across groups).
    // Spark-only: greedy suppression isn't ANSI-SQL-expressible; invariants
    // are asserted in BBoxSpec instead.
    "q37_nms" -> { (s, d) =>
      val boxes = BBoxOps.syntheticBoxes(Tables.events(s, d), 50)
      BBoxOps.nms(s, boxes, iouThreshold = 0.5)
        .select("frame", "box_id", "confidence")
        .orderBy("frame", "box_id")
    },

    // Approx distinct (HLL++) beside the exact count — Spark-only: sketch
    // estimates are engine-specific (accuracy asserted in tests).
    "q38_approx_distinct" -> { (s, d) =>
      Tables.events(s, d).agg(
        approx_count_distinct("user_id").as("n_users_approx"),
        countDistinct("user_id").as("n_users_exact"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q36_bbox_iou" ->
      """WITH boxes AS (SELECT event_id // 50 AS frame, event_id AS box_id,
        |    event_id * 13 % 600 AS x0, event_id * 29 % 600 AS y0,
        |    event_id * 13 % 600 + event_id * 7 % 120 + 20 AS x1,
        |    event_id * 29 % 600 + event_id * 11 % 120 + 20 AS y1
        |  FROM events),
        |pairs AS (
        |  SELECT a.frame, a.box_id AS id_a, b.box_id AS id_b,
        |    greatest(least(a.x1, b.x1) - greatest(a.x0, b.x0), 0)
        |      * greatest(least(a.y1, b.y1) - greatest(a.y0, b.y0), 0) AS inter,
        |    (a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0) AS areas
        |  FROM boxes a JOIN boxes b ON a.frame = b.frame AND a.box_id < b.box_id)
        |SELECT frame, id_a, id_b, CAST(inter AS DOUBLE) / (areas - inter) AS iou
        |FROM pairs WHERE CAST(inter AS DOUBLE) / (areas - inter) >= 0.2
        |ORDER BY frame, id_a, id_b""".stripMargin
  )
}
