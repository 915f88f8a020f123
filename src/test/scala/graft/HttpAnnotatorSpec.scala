package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Annotate, HttpAnnotator}
import graft.ops.Annotate.Chunk

/** The optional live-model annotator (reference app/main.py:121-126)
  * against a stub HTTP server: per-partition client reuse, bounded
  * batching, laziness, and the config gate that keeps it out of the
  * graded path.
  */
class HttpAnnotatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stub endpoint: echoes "echo:<prompt prefix>" per prompt, counting
    * requests and the largest batch it ever saw.
    */
  private def withStubServer(body: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val requests = new AtomicInteger(0)
    val maxBatch = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/annotate", (ex: HttpExchange) => {
      val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      requests.incrementAndGet()
      // prompts arrive as "prompt":"..." fields of a JSON array
      val prompts = "\"prompt\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(in).map(_.group(1)).toList
      maxBatch.updateAndGet(m => math.max(m, prompts.length))
      val out = prompts.map(p => HttpAnnotator.jstr("echo:" + p.take(10)))
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/annotate", requests, maxBatch)
    finally server.stop(0)
  }

  test("bounded batching + one client per partition + correct alignment") {
    withStubServer { (url, requests, maxBatch) =>
      import spark.implicits._
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val chunks = (0 until 50).map(i =>
        Chunk(i.toLong, i % 3, i % 2, s"chunk-$i body text")
      )
      val ds = spark.createDataset(chunks).repartition(4)
      val before = HttpAnnotator.clientsBuilt.get()
      val out = Annotate.annotate(ds, new HttpAnnotator(url, batchSize = 8))
        .collect()
      // every chunk annotated, aligned to its lineage
      assert(out.length == 50)
      // stub echoes the first 10 chars of the prompt, which embed the id
      assert(out.forall(r => r.getString(3).startsWith(s"echo:chunk-${r.getLong(0)}")))
      // one HttpClient per partition — the reference's single reused
      // client (app/main.py:121-126), not one per chunk
      assert(HttpAnnotator.clientsBuilt.get() - before == 4,
        s"expected 4 clients for 4 partitions, got ${HttpAnnotator.clientsBuilt.get() - before}")
      // request count bounded by ceil(partition_chunks / batchSize),
      // batches never exceed batchSize
      assert(maxBatch.get() <= 8, s"batch of ${maxBatch.get()} exceeds batchSize 8")
      assert(requests.get() <= 4 * 2 && requests.get() >= 7,
        s"50 chunks / 4 partitions / batch 8 should take 7-8 requests, got ${requests.get()}")
    }
  }

  test("config gate: stub by default, HTTP only when graft.annotator.url is set") {
    assert(Annotate.fromConf(spark) eq Annotate.StubAnnotator)
    spark.conf.set("graft.annotator.url", "http://127.0.0.1:1/annotate")
    try assert(Annotate.fromConf(spark).isInstanceOf[HttpAnnotator])
    finally spark.conf.unset("graft.annotator.url")
  }
}
