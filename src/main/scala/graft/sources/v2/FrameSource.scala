package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 frame-stream source: the slot where real MP4/RTSP decode
  * plugs in (SURVEY.md §7.4; `/root/reference/uav/frame_reader.py:116-199`).
  * Codec libraries are absent in this container, so frames are generated
  * deterministically from their index — but the connector machinery is
  * the real thing:
  *
  *  - `TableProvider` + `DataSourceRegister` (`format("graft-frames")`),
  *  - schema inference from options (the reference probes w/h/fps at
  *    source-open, `frame_reader.py:129-131`),
  *  - column pruning (`SupportsPushDownRequiredColumns`) — a pruned scan
  *    never materializes the payload bytes,
  *  - filter pushdown (`SupportsPushDownFilters`) — frame_number range
  *    predicates shrink the generated range instead of post-filtering,
  *  - parallel `InputPartition` planning — the frame range splits across
  *    `numPartitions` readers, so ingest scales horizontally.
  *
  * Options: frames (count), width, height, fps (int), numPartitions,
  * startEpochUs.
  */
class FrameSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-frames"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FrameTable(FrameSource.Config(new CaseInsensitiveStringMap(properties)))
}

object FrameSource {
  val schema: StructType = StructType(Seq(
    StructField("frame_number", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", DoubleType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  final case class Config(frames: Long, width: Int, height: Int, fps: Int,
                          numPartitions: Int, startEpochUs: Long, ratePerBatch: Long)
  object Config {
    def apply(o: CaseInsensitiveStringMap): Config = Config(
      frames = o.getLong("frames", 1000L),
      width = o.getInt("width", 640),
      height = o.getInt("height", 480),
      fps = o.getInt("fps", 30),
      numPartitions = o.getInt("numPartitions", 8),
      startEpochUs = o.getLong("startEpochUs", 1704067200000000L),
      ratePerBatch = o.getLong("ratePerBatch", 1000L))
  }

  /** Deterministic stand-in for decoded bytes (64 B, not W×H×3 — a real
    * codec would fill actual pixels here). */
  def payloadFor(frame: Long): Array[Byte] =
    Array.tabulate(64)(i => ((frame * 31 + i) % 256).toByte)
}

class FrameTable(config: FrameSource.Config) extends Table with SupportsRead {
  override def name(): String = s"graft_frames(${config.frames})"
  override def schema(): StructType = FrameSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameScanBuilder(config)
}

class FrameScanBuilder(config: FrameSource.Config)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = FrameSource.schema
  private var lo: Long = 0L
  private var hi: Long = config.frames // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("frame_number", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("frame_number", v: Long) => lo = math.max(lo, v); true
      case LessThan("frame_number", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("frame_number", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("frame_number", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new FrameScan(config, required, lo, math.max(lo, hi))
}

class FrameScan(config: FrameSource.Config, required: StructType, lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FrameMicroBatchStream(config, required, lo, hi)
  override def description(): String =
    s"graft-frames [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, config.numPartitions)
    val total = math.max(0L, hi - lo)
    (0 until n).map { i =>
      val start = lo + total * i / n
      val end = lo + total * (i + 1) / n
      FrameInputPartition(start, end): InputPartition
    }.filter { case FrameInputPartition(s, e) => e > s }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(config, required)
}

final case class FrameInputPartition(start: Long, end: Long) extends InputPartition

/** Frame-index offset for the streaming path (json = the next frame). */
final case class FrameOffset(frame: Long) extends Offset {
  override def json(): String = frame.toString
}

/** Unbounded face of the same source: the RTSP analog
  * (`frame_reader.py:158-199`) — frames arrive `ratePerBatch` per
  * trigger until `frames` is reached. Offsets are frame indices, so the
  * stream is replayable from any checkpoint (an upgrade over the
  * reference's at-most-once, SURVEY.md S3). */
class FrameMicroBatchStream(config: FrameSource.Config, required: StructType,
                            lo: Long, hi: Long) extends MicroBatchStream {
  private var available: Long = lo

  override def initialOffset(): Offset = FrameOffset(lo)

  override def latestOffset(): Offset = {
    available = math.min(hi, available + config.ratePerBatch)
    FrameOffset(available)
  }

  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].frame
    val e = end.asInstanceOf[FrameOffset].frame
    val n = math.max(1, config.numPartitions)
    val total = math.max(0L, e - s)
    (0 until n).map { i =>
      FrameInputPartition(s + total * i / n, s + total * (i + 1) / n): InputPartition
    }.filter { case FrameInputPartition(a, b) => b > a }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(config, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class FrameReaderFactory(config: FrameSource.Config, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FrameInputPartition]
    new FramePartitionReader(config, required, p.start, p.end)
  }
}

class FramePartitionReader(config: FrameSource.Config, required: StructType,
                           start: Long, end: Long)
    extends PartitionReader[InternalRow] {
  private var frame = start - 1

  // resolve once per reader: which output slot feeds from which field
  private val fieldGens: Array[Long => Any] = required.fieldNames.map {
    case "frame_number" => (f: Long) => f
    case "ts_us" => (f: Long) => config.startEpochUs + f * 1000000L / config.fps
    case "width" => (_: Long) => config.width
    case "height" => (_: Long) => config.height
    case "fps" => (_: Long) => config.fps.toDouble
    case "payload" => (f: Long) => FrameSource.payloadFor(f)
  }

  override def next(): Boolean = { frame += 1; frame < end }

  override def get(): InternalRow =
    new GenericInternalRow(fieldGens.map(g => g(frame)).asInstanceOf[Array[Any]])

  override def close(): Unit = ()
}
