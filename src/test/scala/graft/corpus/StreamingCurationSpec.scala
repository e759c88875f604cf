package graft.corpus

import java.nio.file.Files

import graft.SparkSpec

/** Streaming corpus ingest e2e: tick drains landing JSONL, quarantines
  * garbage, and re-delivered documents never duplicate in the store. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("ticks drain, quarantine, and stay idempotent under redelivery") {
    val landing = Files.createTempDirectory("graft_sc_landing")
    val ckpt = Files.createTempDirectory("graft_sc_ckpt")
    val store = Files.createTempDirectory("graft_sc_store").toString + "/docs"
    val quar = Files.createTempDirectory("graft_sc_quar").toString + "/bad"
    def tick(): Unit = StreamingCuration.ingestTick(
      spark, landing.toString, ckpt.toString, store, quar)

    Files.writeString(landing.resolve("drop1.jsonl"), Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""",
      """{"doc_id": 2, "text": "two tokens", "lang": "en", "source": "s1"}""",
      """not json garbage""").mkString("\n"))
    tick()
    assert(spark.read.parquet(store).count() == 2L)
    assert(spark.read.json(quar).count() == 1L)

    // tick 2: one new doc, plus doc 1 RE-DELIVERED under a new filename
    Files.writeString(landing.resolve("drop2.jsonl"), Seq(
      """{"doc_id": 3, "text": "third doc", "lang": "de", "source": "s0"}""",
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""")
      .mkString("\n"))
    tick()
    val docs = spark.read.parquet(store)
    assert(docs.count() == 3L) // not 4: the redelivery was anti-joined away
    assert(docs.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // source partitioning holds (the downstream pruning key)
    assert(new java.io.File(store).listFiles()
      .count(_.getName.startsWith("source=")) == 2)
    // a quiet tick changes nothing
    tick()
    assert(spark.read.parquet(store).count() == 3L)
    assert(spark.read.json(quar).count() == 1L)
  }
}
