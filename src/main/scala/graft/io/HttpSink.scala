package graft.io

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/** K5 — HTTP insert sink (the reference's ABAP→BigQuery `insertAll`
  * sketch, `ETL.abap:26-43`: rows serialized to a JSON payload, POSTed
  * to a REST endpoint, HTTP status checked).
  *
  * Spark-first shape: rows are serialized with the engine's own JSON
  * writer (`df.toJSON`, codegen'd — not a driver loop), then each
  * *partition* streams its rows out in bounded batches from the
  * executor. Nothing is collected to the driver, so the sink scales
  * with the cluster: 1000 executors POST in parallel, each holding at
  * most `batchSize` rows in memory.
  *
  * Delivery contract is the same as the reference's (at-least-once):
  * a non-2xx response or connection failure throws, which fails the
  * Spark task and triggers task retry — the HTTP endpoint must be
  * idempotent (BigQuery `insertAll` dedups on `insertId`, which is why
  * the reference's sketch can retry safely). Bounded in-task retry
  * mirrors the ES client's `max_retries=3` (`comlib.py:221`).
  *
  * Batching mirrors K3: `batchSize` rows per request (BigQuery caps
  * insertAll payloads, the reference's ES bulk sink flushes every
  * 300k docs — same pattern, smaller default because HTTP request
  * bodies are the unit here).
  */
object HttpSink {

  /** POST `df` to `url` as newline-delimited JSON batches wrapped in an
    * insertAll-style envelope `{"rows":[...]}`.
    *
    * @return number of rows successfully posted (driver-side total,
    *         via accumulator — feeds K6's `cretn_cnt`).
    */
  def post(df: DataFrame, url: String, batchSize: Int = 500,
           maxRetries: Int = 3, timeoutMs: Int = 300000): Long = {
    val sent: LongAccumulator =
      df.sparkSession.sparkContext.longAccumulator("http_sink_rows")
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach { batch =>
        val payload = batch.mkString("{\"rows\":[", ",", "]}")
        postWithRetry(url, payload, maxRetries, timeoutMs)
        sent.add(batch.size)
      }
    }
    sent.value
  }

  private def postWithRetry(url: String, payload: String,
                            maxRetries: Int, timeoutMs: Int): Unit = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try {
        postOnce(url, payload, timeoutMs)
        return
      } catch {
        // Only retry recoverable I/O failures: fatal JVM errors
        // propagate immediately, and InterruptedException must surface
        // at once so task-kill (speculation, stage cancel) isn't
        // delayed by the retry loop.
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          attempt += 1
          if (attempt <= maxRetries)
            Thread.sleep(math.min(100L << (attempt - 1), 2000L))
      }
    }
    throw new RuntimeException(
      s"HTTP sink failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
      lastErr)
  }

  private def postOnce(url: String, payload: String, timeoutMs: Int): Unit = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json; charset=utf-8")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try { out.write(bytes); out.flush() } finally out.close()
      val code = conn.getResponseCode
      // drain the response so the connection can be reused
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) { while (in.read() != -1) {}; in.close() }
      if (code < 200 || code >= 300)
        throw new RuntimeException(s"HTTP $code from $url")
    } finally conn.disconnect()
  }
}
