package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Embed, HttpAnnotator, HttpEmbedder}
import graft.ops.Embed.{HashedNgramEmbedder, TextRow}

/** The embedding seam's HTTP counterpart (VERDICT r6 #5, mirroring
  * HttpAnnotatorSpec): per-partition client reuse, bounded batching,
  * alignment — and end-to-end parity of the text→HTTP-vector→top-k
  * retrieval path with the precomputed-embeddings path, proven by
  * running the same retrieval on both vector sets.
  */
class HttpEmbedderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Stub model server: embeds each text with the SAME deterministic
    * HashedNgramEmbedder the offline path uses (a "real model" that
    * happens to be reproducible), counting requests and max batch.
    * Float.toString round-trips exactly, so wire transport is
    * bit-lossless.
    */
  private def withStubServer(body: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val requests = new AtomicInteger(0)
    val maxBatch = new AtomicInteger(0)
    val model = new HashedNgramEmbedder()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => {
      val in = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      requests.incrementAndGet()
      val texts = "\"text\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(in).map(m => HttpAnnotator.junstr("\"" + m.group(1) + "\"")).toList
      maxBatch.updateAndGet(m => math.max(m, texts.length))
      val out = texts.map { t =>
        model.embed(Iterator(TextRow(0L, t))).next().embedding
          .mkString("[", ",", "]")
      }.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/embed", requests, maxBatch)
    finally server.stop(0)
  }

  test("bounded batching + one client per partition + alignment") {
    withStubServer { (url, requests, maxBatch) =>
      import spark.implicits._
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val texts = (0 until 50).map(i => TextRow(i.toLong, s"text-$i body"))
      val ds = spark.createDataset(texts).repartition(4)
      val before = HttpEmbedder.clientsBuilt.get()
      val out = Embed.embed(ds, new HttpEmbedder(url, batchSize = 8)).collect()
      assert(out.length == 50)
      assert(out.forall(_.embedding.length == 64))
      assert(HttpEmbedder.clientsBuilt.get() - before == 4,
        s"expected 4 clients for 4 partitions, got ${HttpEmbedder.clientsBuilt.get() - before}")
      assert(maxBatch.get() <= 8, s"batch of ${maxBatch.get()} exceeds batchSize 8")
      assert(requests.get() <= 4 * 2 && requests.get() >= 7,
        s"50 texts / 4 partitions / batch 8 should take 7-8 requests, got ${requests.get()}")
      // alignment: the wire vector for each doc equals the local model's
      val local = Embed.embed(ds).collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
      assert(out.forall(r => r.embedding.toSeq == local(r.doc_id)))
    }
  }

  test("text→HTTP-vector→top-k retrieval matches the precomputed path") {
    withStubServer { (url, _, _) =>
      import spark.implicits._
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val docs = graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).as[TextRow]
      // the q_topk_knn shape: probe = doc 0's vector, cosine top-5 over
      // the rest — run IDENTICAL retrieval code on both vector sets
      def top5(vecs: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
        val probe = vecs.filter(col("doc_id") === 0)
          .select(col("embedding").as("pe"))
        vecs.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(probe))
          .withColumn("cos_sim", round(graft.util.Det.cosine("pe", "embedding"), 6))
          .orderBy(col("cos_sim").desc, col("doc_id"))
          .limit(5)
          .select(col("doc_id"), col("cos_sim"))
          .collect().toSeq.map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      }
      val viaHttp = top5(Embed.embed(docs, new HttpEmbedder(url)).toDF())
      val precomputed = top5(Embed.embed(docs).toDF())
      assert(viaHttp.nonEmpty)
      assert(viaHttp == precomputed)
    }
  }

  test("config gate: deterministic stub by default, HTTP only when url set") {
    assert(Embed.fromConf(spark).isInstanceOf[HashedNgramEmbedder])
    spark.conf.set("graft.embedder.url", "http://127.0.0.1:1/embed")
    try assert(Embed.fromConf(spark).isInstanceOf[HttpEmbedder])
    finally spark.conf.unset("graft.embedder.url")
  }
}
