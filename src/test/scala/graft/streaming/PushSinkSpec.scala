package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PushSink: the sender's at-most-once delivery semantics against a real
  * localhost endpoint — failures are logged + counted + dropped and the
  * stream always runs to completion.
  */
class PushSinkSpec extends SparkSpec {

  /** q59-shaped payload stream: every-100th event as a JSON message
    * (sf0.001 events = 1000 rows → exactly 10 payloads). */
  private def payloads = EventStreams.eventsStream(spark, sf0001)
    .filter(col("event_id") % 100 === 0)
    .select(to_json(struct(col("event_id"), col("event_type"), col("value")))
      .as("payload"))

  private def withServer(handler: (HttpExchange, Int) => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent handler pool: the default (null) executor serializes all
    // requests on one dispatcher thread, so a single slow request would
    // stall — and spuriously time out — every concurrently-sent record
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val seen = new AtomicInteger(0)
    server.createContext("/ingest", (ex: HttpExchange) => {
      val n = seen.incrementAndGet()
      val in = ex.getRequestBody
      try { val buf = new Array[Byte](4096); while (in.read(buf) >= 0) () }
      finally in.close()
      handler(ex, n)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/ingest")
    finally server.stop(0)
  }

  test("every-3rd-request failures are dropped and counted; the stream survives") {
    val failures = new AtomicInteger(0)
    withServer { (ex, n) =>
      if (n % 3 == 0) { failures.incrementAndGet(); ex.sendResponseHeaders(500, -1) }
      else ex.sendResponseHeaders(200, -1)
    } { endpoint =>
      val stats = PushSink.run(payloads, endpoint, timeoutMs = 5000)
      // at-most-once: attempts == records, no retries — the server's
      // global counter fails exactly floor(10/3) = 3 of the 10 sends
      assert(failures.get() == 3)
      assert(stats == PushSink.SendStats(delivered = 7, dropped = 3))
    }
  }

  test("a hung endpoint times out per record instead of killing the stream") {
    withServer { (ex, n) =>
      if (n == 1) Thread.sleep(6000) // exceed the 1.5 s read timeout once
      ex.sendResponseHeaders(200, -1)
    } { endpoint =>
      // generous margin over normal localhost latency: a loaded machine
      // must not spuriously time out the 9 healthy requests
      val stats = PushSink.run(payloads, endpoint, timeoutMs = 1500)
      // exactly one timeout drop; which record hits it is scheduling-
      // dependent, so assert the split, not the identity
      assert(stats.delivered + stats.dropped == 10)
      assert(stats.dropped == 1)
    }
  }
}
