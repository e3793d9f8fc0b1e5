package graft.streaming

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

/** K2's physical delivery path — the reference sender's failure semantics
  * (`/root/reference/uav/frame_processing.py:251-262`): each keyframe
  * payload is POSTed with a bounded timeout; a timeout or HTTP error is
  * logged, counted, and the record DROPPED. At-most-once, fire-and-forget
  * — a dead endpoint must never kill the stream.
  *
  * Implemented as a [[ForeachWriter]] sink: open/process/close per
  * partition per epoch, sends fan out across executors. Accounting rides
  * on accumulators, which count per ATTEMPT: if Spark retries a failed
  * task the records of that partition are re-sent (still at most once per
  * attempt, no dedup) and re-counted — exactly the reference's
  * fire-and-forget contract, which keeps no delivery log either.
  */
object PushSink {

  /** Records delivered (2xx) vs dropped (timeout / IO error / non-2xx). */
  final case class SendStats(delivered: Long, dropped: Long)

  /** Runs a (bounded) streaming DataFrame with a `payload` string column
    * to completion, POSTing every record to `endpoint`.
    *
    * @param timeoutMs connect AND read timeout per request (reference
    *                  default 10 s)
    */
  def run(payloads: DataFrame, endpoint: String, timeoutMs: Int = 10000): SendStats = {
    val sc = payloads.sparkSession.sparkContext
    val delivered = sc.longAccumulator("graft_push_delivered")
    val dropped = sc.longAccumulator("graft_push_dropped")
    val writer = new ForeachWriter[Row] {
      override def open(partitionId: Long, epochId: Long): Boolean = true
      override def process(row: Row): Unit = {
        try {
          post(endpoint, row.getAs[String]("payload"), timeoutMs)
          delivered.add(1L)
        } catch { case NonFatal(e) =>
          // reference behavior: log + drop, never rethrow — the stream
          // outlives any individual failed send
          System.err.println(s"[push] dropped payload: ${e.getMessage}")
          dropped.add(1L)
        }
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }
    val query = payloads.writeStream.outputMode("append").foreach(writer).start()
    try query.processAllAvailable()
    finally query.stop()
    SendStats(delivered.value, dropped.value)
  }

  /** One POST; non-2xx status or any IO problem throws.
    *
    * On success the response stream is fully drained and closed but the
    * connection is NOT disconnected — JDK `HttpURLConnection` then parks
    * the socket in its keep-alive cache, so consecutive records on a
    * partition reuse one TCP connection instead of paying a handshake per
    * payload. `disconnect()` (which closes the socket) only runs on the
    * failure path, where the connection state is suspect anyway. */
  private def post(endpoint: String, body: String, timeoutMs: Int): Unit = {
    val conn = java.net.URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setDoOutput(true)
      val bytes = body.getBytes("UTF-8")
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try { out.write(bytes); out.flush() } finally out.close()
      val code = conn.getResponseCode
      // drain whichever stream the status selected so the socket is
      // keep-alive-reusable instead of torn down half-read
      val in = if (code / 100 == 2) conn.getInputStream else conn.getErrorStream
      if (in != null) try {
        val buf = new Array[Byte](4096)
        while (in.read(buf) >= 0) ()
      } finally in.close()
      if (code / 100 != 2) throw new java.io.IOException(s"HTTP $code from $endpoint")
    } catch { case e: Throwable =>
      conn.disconnect()
      throw e
    }
  }
}
