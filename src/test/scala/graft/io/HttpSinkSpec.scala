package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkSpec

/** K5 — HTTP insert sink against a real in-JVM HTTP endpoint
  * (executors run in this JVM under local mode, so the loopback server
  * sees exactly the requests a remote endpoint would).
  */
class HttpSinkSpec extends SparkSpec {

  /** Start a loopback server; hand each request body to `onBody`,
    * answer with `status`. Returns (url, stop). */
  private def serve(status: AtomicInteger, onBody: String => Unit): (String, () => Unit) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/insertAll", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        onBody(body)
        val resp = "{}".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status.get(), resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.setExecutor(null)
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}/insertAll",
      () => server.stop(0))
  }

  test("posts every row exactly once in bounded batches") {
    val rows = new AtomicLong(0)
    val batches = new AtomicInteger(0)
    val maxBatch = new AtomicInteger(0)
    val ok = new AtomicInteger(200)
    val (url, stop) = serve(ok, { body =>
      assert(body.startsWith("{\"rows\":[") && body.endsWith("]}"))
      val n = body.sliding("\"n_nationkey\"".length).count(_ == "\"n_nationkey\"")
      rows.addAndGet(n)
      batches.incrementAndGet()
      maxBatch.getAndUpdate(m => math.max(m, n))
    })
    try {
      val nation = graft.core.Tables.load(spark, sfDir, "nation")
      val sent = HttpSink.post(nation, url, batchSize = 7)
      assert(sent == 25)
      assert(rows.get() == 25)
      // 25 rows in batches of <=7 across >=1 partitions
      assert(maxBatch.get() <= 7 && batches.get() >= 4)
    } finally stop()
  }

  test("transient failures are retried with backoff until success") {
    val attempts = new AtomicInteger(0)
    val status = new AtomicInteger(500)
    val (url, stop) = serve(status, { _ =>
      // first attempt answers 500; every later attempt answers 200
      if (attempts.incrementAndGet() >= 2) status.set(200)
    })
    try {
      val nation = graft.core.Tables.load(spark, sfDir, "nation").coalesce(1)
      val sent = HttpSink.post(nation, url, batchSize = 100, maxRetries = 3)
      assert(sent == 25)
      assert(attempts.get() == 2) // 500 then 200 — in-task retry, no task restart
    } finally stop()
  }

  test("non-2xx fails the write after bounded retries") {
    val attempts = new AtomicInteger(0)
    val bad = new AtomicInteger(500)
    val (url, stop) = serve(bad, _ => attempts.incrementAndGet())
    try {
      val nation = graft.core.Tables.load(spark, sfDir, "nation").coalesce(1)
      val e = intercept[Exception] {
        HttpSink.post(nation, url, batchSize = 100, maxRetries = 2)
      }
      assert(e.getMessage.contains("HTTP") || e.getCause != null)
      // 1 original + 2 retries per Spark task attempt, at least one task
      assert(attempts.get() >= 3)
    } finally stop()
  }
}
