package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared streaming plumbing for the events table — the single place
  * that knows the physical schema, the TIMESTAMP(NANOS) workaround, and
  * how to run a bounded stream to completion.
  */
object EventStreams {

  /** Reference default sampling interval (`uav/main.py:50-54`). */
  val KeyframeInterval = 30

  /** Logical schema of events.parquet with `ts` read as `tsType` — the
    * generator has shipped `ts` as both TIMESTAMP(NANOS) (Spark reads it
    * as long under nanosAsLong) and TIMESTAMP(MICROS) (native
    * TimestampType), so the physical type is probed per directory, never
    * assumed. A hardcoded NANOS schema against µs data silently divides
    * every timestamp by 1000 and collapses the whole time axis — the
    * round-8 streaming-family correctness failure. */
  private def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded scan of the events table with µs TimestampType `ts`.
    * The timestamp unit is probed from the parquet footer via a batch
    * read (same adaptive rule as [[graft.Tables]]): a LongType read means
    * TIMESTAMP(NANOS) under the legacy conf → truncate to µs; a native
    * TimestampType read streams through unchanged. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an empty/not-yet-existing directory (the growing-stream case —
    // FanOutSpec's empty-input run) has no footer to probe: assume the
    // current generator's µs-NTZ flavor; files appearing later with a
    // different unit would need the directory probed at (re)start, which
    // a bounded harness run never hits
    val physicalTs =
      try spark.read.parquet(sfDir + "/events.parquet").schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampNTZType }
    val raw = spark.readStream
      .schema(eventsSchema(physicalTs))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    physicalTs match {
      // TIMESTAMP(NANOS) read as long under the legacy conf → µs
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // TIMESTAMP(MICROS) without timezone → TimestampNTZ, which
      // watermarks reject; the session zone is pinned UTC so the cast
      // relabels without shifting the instant
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Runs a (bounded) streaming DataFrame to completion through a FILE
    * sink and reads the result back — the scale-safe drain: results go
    * executor→disk in parallel, never through the driver. `append` mode
    * accumulates each batch's new rows; `complete` mode keeps the last
    * batch's full result (overwrite per batch via `foreachBatch`, the
    * standard pattern for complete-mode output to files — the plain file
    * sink is append-only). This is the drain behind every `SparkEntry`
    * streaming query; [[drain]] (memory sink) remains for update-mode
    * state inspection in specs. */
  def drainToFiles(df: DataFrame, mode: String): DataFrame =
    drainToFilesCounting(df, mode)._1

  /** Engine-reported stats of the most recent [[drainToFilesCounting]]
    * run in this JVM: micro-batch count, peak stateful-operator state
    * rows, and watermark drops — the observables the 10× streaming scale
    * probe reads ([[graft.StreamProbe]], VERDICT r3 item 7). Captured
    * from the same synchronous progress buffer the drop count uses. */
  final case class StreamRunStats(batches: Int, stateRowsMax: Long,
                                  stateRowsEnd: Long, dropped: Long,
                                  width: Int = 0)
  @volatile var lastRunStats: Option[StreamRunStats] = None

  /** State-partition width for the query-path streams. A streaming
    * stateful operator's partition count is fixed by
    * `spark.sql.shuffle.partitions` at FIRST query start (recorded in the
    * checkpoint thereafter) and is the unit of state-store overhead: every
    * micro-batch commits a delta per store per partition — a stream-stream
    * join carries FOUR stores per partition — so width costs per-batch
    * file IO whether or not the partitions hold state. Sizing it to state
    * volume rather than inheriting the batch shuffle width halved every
    * stateful query at sf0.1 (q71 6.0→2.2 s, family 17.6→9.6 s measured
    * at 32 vs 8 by [[graft.StreamPartProbe]], which sweeps this var). On
    * a real cluster this is the same knob sized UP — hundreds of
    * partitions for TB-scale state; results are partition-count-
    * independent either way (every query-path stream re-sorts after the
    * drain). Env-overridable for cluster runs; the env parse is LAZY
    * (not object-init) so a typo'd value surfaces as a named
    * IllegalArgumentException at the first stream start — an eager field
    * would wrap it in ExceptionInInitializerError and poison every later
    * EventStreams touch with a message-less NoClassDefFoundError.
    *
    * Since r17 the un-overridden width is DERIVED per run from the
    * stream's input volume ([[derivedParts]]) instead of a constant —
    * the optimization-guide rule that partitioning must be
    * scale-adaptive rather than tuned to either local mode or one
    * cluster. This getter (the probe/spec surface) reports
    * override/env/default; the derivation applies inside
    * [[drainToFilesCounting]], where the stream's sources are known. */
  def StreamShufflePartitions: Int =
    partsOverride.orElse(envStreamParts).getOrElse(DefaultStreamParts)
  /** Probe/test hook ([[graft.StreamPartProbe]] sweeps this). */
  def StreamShufflePartitions_=(v: Int): Unit = { partsOverride = Some(v) }
  /** Clears any probe override so the env/default read applies again —
    * sweeps must restore via this, not by re-assigning the captured
    * default, or a later SPARK_GRAFT_STREAM_PARTS read is masked for
    * the rest of the JVM. */
  def resetStreamShufflePartitions(): Unit = { partsOverride = None }
  @volatile private var partsOverride: Option[Int] = None
  /** Fallback width when neither an override nor the env nor a
    * derivable input size is present. */
  private val DefaultStreamParts = 8
  private lazy val envStreamParts: Option[Int] = {
    sys.env.get("SPARK_GRAFT_STREAM_PARTS").map { raw =>
      val parsed = raw.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_STREAM_PARTS must be a positive int, got '$raw'"))
      require(parsed > 0, s"SPARK_GRAFT_STREAM_PARTS must be > 0, got $parsed")
      parsed
    }
  }

  /** Input-volume target per state partition for the DERIVED width
    * below — every partition is a per-batch state-store commit (delta
    * file + fsync per store, ×4 stores for a stream-stream join), so
    * width is pure fixed cost until state actually fills it. 32 MB of
    * source input per partition keeps the gate corpora at the 2-wide
    * floor (events.parquet at sf0.1 is 2 MB) while a 100× corpus
    * derives ~7 and a TB-scale one derives hundreds — the same knob a
    * cluster deployment sizes UP for TB state, reached by data volume
    * instead of a constant. Measured at sf0.1 (StreamPartProbe sweep,
    * r17): width 8 → 2 is q71 3.76 → 2.31 s and −8…−38% across the
    * whole streamed family, with zero result change (every query-path
    * stream re-sorts after the drain). */
  private val BytesPerStatePartition: Long = 32L << 20

  /** Scale-ADAPTIVE state width (r17, optimization guide §2.2/§6): the
    * total on-disk size of the stream's FILE sources, divided by
    * [[BytesPerStatePartition]], floored at 2 (so the seam semantics
    * the specs pin — cross-partition merges, multi-store commits —
    * always exercise real fan-out). Returns None for non-file sources
    * (RTSP, DSv2 probes), which fall back to [[DefaultStreamParts]].
    * Precedence: probe override > SPARK_GRAFT_STREAM_PARTS > derived >
    * default — a cluster run pins the env and never pays the listing. */
  private def derivedParts(df: DataFrame): Option[Int] = try {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val sizes = df.queryExecution.analyzed.collect {
      case sr: org.apache.spark.sql.execution.streaming.runtime.StreamingRelation =>
        val ds = sr.dataSource
        val glob = ds.options.collectFirst {
          case (k, v) if k.equalsIgnoreCase("pathGlobFilter") => v
        }
        val paths =
          if (ds.paths.nonEmpty) ds.paths
          else ds.options.collectFirst {
            case (k, v) if k.equalsIgnoreCase("path") => v
          }.toSeq
        paths.map { p =>
          val base = new org.apache.hadoop.fs.Path(p)
          val fs = base.getFileSystem(conf)
          glob match {
            // ADVICE r17: globStatus only matches DIRECT children and
            // returns a directory's own entry length (~KB) for a
            // multi-part dataset directory, while pathGlobFilter matches
            // LEAF files recursively — so the old form collapsed the
            // derived width to the floor at exactly the multi-file scale
            // the feature targets. Mirror the source: list leaf files
            // recursively and sum the ones whose NAME matches the glob.
            case Some(g) =>
              val filter = new org.apache.hadoop.fs.GlobFilter(g)
              val it = fs.listFiles(base, true)
              var total = 0L
              while (it.hasNext) {
                val st = it.next()
                if (filter.accept(st.getPath)) total += st.getLen
              }
              total
            case None => fs.getContentSummary(base).getLength
          }
        }
    }.flatten
    if (sizes.isEmpty) None
    else {
      val total = sizes.sum
      Some(math.max(2L,
        (total + BytesPerStatePartition - 1) / BytesPerStatePartition).toInt)
    }
  } catch { case _: Exception => None }

  /** The width a given stream should run at — see [[derivedParts]]. */
  private def widthFor(df: DataFrame): Int =
    partsOverride.orElse(envStreamParts)
      .orElse(derivedParts(df)).getOrElse(DefaultStreamParts)

  /** Runs `body` with the session's `spark.sql.shuffle.partitions`
    * scoped to [[widthFor]] of `df` — the shared width helper (VERDICT
    * r17 item 3) for the streamed faces that run their OWN
    * `writeStream` (transformWithState / mapGroupsWithState /
    * foreachBatch replays) instead of draining through
    * [[drainToFilesCounting]]. Those faces otherwise inherit the
    * session's BATCH width (32 at driver settings) as their state-store
    * partition count, paying a per-micro-batch commit per store per
    * partition that the derived width already proved unnecessary at the
    * gate SFs. The width must be set BEFORE `start()` — a stateful
    * operator's partition count is fixed at first query start and
    * recorded in the checkpoint — and the previous session width is
    * restored even when `body` throws, so batch queries never keep
    * running at stream width. */
  def withStreamWidth[T](df: DataFrame)(body: => T): T = {
    val spark = df.sparkSession
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(partsKey)
    try {
      spark.conf.set(partsKey, widthFor(df).toString)
      body
    } finally prev match {
      case Some(v) => spark.conf.set(partsKey, v)
      case None => spark.conf.unset(partsKey)
    }
  }

  /** [[drainToFiles]] plus the number of input rows the stateful operators
    * dropped as later than the watermark. The count comes from the
    * engine's own `numRowsDroppedByWatermark` metric — an `Observation`
    * upstream of the aggregation cannot see these drops, because they
    * happen inside the stateful operator itself. `query.recentProgress`
    * retains only `spark.sql.streaming.numRecentProgressUpdates` entries
    * (default 100), which would silently undercount longer multi-batch
    * runs — the retention is raised for the duration of this run (the
    * synchronous progress buffer is race-free, unlike a listener whose
    * events arrive on an async bus).
    *
    * Runs the stream at [[widthFor]] (probe override > env > width
    * DERIVED from the stream's file-source bytes > default — note the
    * [[StreamShufflePartitions]] getter reports only override/env/
    * default; the per-run EFFECTIVE width is recorded on
    * [[lastRunStats]].width, ADVICE r17); the session's batch width is
    * restored afterwards (micro-batch planning reads the conf at
    * start(), so the scoped set binds only this query's state layout). */
  def drainToFilesCounting(df: DataFrame, mode: String): (DataFrame, Long) = {
    // update-mode would silently duplicate keys through an append parquet
    // write (each state revision appended as a fresh row) — fail fast.
    require(mode == "append" || mode == "complete",
      s"drainToFiles supports append|complete, got '$mode' (update has no file-write analog)")
    val spark = df.sparkSession
    val root = java.nio.file.Files.createTempDirectory("graft_drain")
    cleanupOnExit(root)
    val dir = root.toString + "/out"
    val writeMode = if (mode == "complete") "overwrite" else "append"
    val retentionKey = "spark.sql.streaming.numRecentProgressUpdates"
    val prevRetention = spark.conf.getOption(retentionKey)
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.getOption(partsKey)
    // the conf sets live INSIDE the restore scope: if start() or stop()
    // throws, the session must not be left buffering 100k progress
    // objects per stream — or running batch queries at the streaming
    // state width — for the rest of a harness run
    val effectiveWidth = widthFor(df)
    val dropped =
      try {
        spark.conf.set(retentionKey, "100000")
        spark.conf.set(partsKey, effectiveWidth.toString)
        val query = df.writeStream.outputMode(mode)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode(writeMode).parquet(dir)
            ()
          }
          .start()
        try query.processAllAvailable()
        finally query.stop()
        val perBatch = query.recentProgress
          .map(p => Option(p.stateOperators).toSeq.flatten)
          .filter(_.nonEmpty)
        val ops = perBatch.flatten
        // stateRowsEnd = state surviving the LAST batch (after the final
        // watermark advance evicted finalized windows/sessions) — the
        // number that must stay horizon-bounded on an unbounded stream,
        // where the peak legitimately includes pre-eviction build-up
        // peak = max over PER-BATCH SUMS of all stateful operators (a
        // per-entry max would understate a multi-operator chain's state)
        lastRunStats = Some(StreamRunStats(
          batches = query.recentProgress.length,
          stateRowsMax =
            if (perBatch.isEmpty) 0L
            else perBatch.map(_.map(_.numRowsTotal).sum).max,
          stateRowsEnd = perBatch.lastOption.map(_.map(_.numRowsTotal).sum).getOrElse(0L),
          dropped = ops.map(_.numRowsDroppedByWatermark).sum,
          width = effectiveWidth))
        ops.map(_.numRowsDroppedByWatermark).sum
      } finally {
        prevRetention match {
          case Some(v) => spark.conf.set(retentionKey, v)
          case None => spark.conf.unset(retentionKey)
        }
        prevParts match {
          case Some(v) => spark.conf.set(partsKey, v)
          case None => spark.conf.unset(partsKey)
        }
      }
    val out =
      if (new java.io.File(dir).exists) spark.read.parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    (out, dropped)
  }

  // The drained parquet must outlive this call (the returned DataFrame
  // reads it lazily), so deletion happens at JVM exit via the shared
  // graft.TempDirs registry.
  private def cleanupOnExit(p: java.nio.file.Path): Unit =
    graft.TempDirs.cleanupOnExit(p)

  /** Runs a (bounded) streaming DataFrame to completion through a memory
    * sink and returns the MATERIALIZED result; the sink table is dropped
    * so repeated calls don't leak driver memory. Harness-scale only — the
    * query-path drain is [[drainToFiles]]; this one stays for update-mode
    * state inspection in specs (update has no file-write analog). */
  def drain(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    val sink = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = df.writeStream.outputMode(mode).format("memory").queryName(sink).start()
    try query.processAllAvailable()
    finally query.stop()
    val table = spark.table(sink)
    val out = spark.createDataFrame(table.collectAsList(), table.schema)
    spark.catalog.dropTempView(sink)
    out
  }
}
