package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The session caches must be keyed by the DATA, not the path string:
  * re-ingesting into the same directory within one session has to bust
  * the entry (stale-serve was the r13 ADVICE medium). Both tests write
  * a directory, consume it through the cache, CHANGE the files at the
  * same path, and require the second lookup to rebuild. */
class CacheInvalidationSpec extends SparkSpec {

  private def tmpDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d
  }

  test("DirFingerprint changes when files change, is stable when not") {
    val d = tmpDir("fp")
    java.nio.file.Files.write(new java.io.File(d, "a.txt").toPath,
      "one".getBytes)
    val fp1 = DirFingerprint.of(spark, d.getAbsolutePath)
    val fp2 = DirFingerprint.of(spark, d.getAbsolutePath)
    assert(fp1 == fp2, "same listing must fingerprint identically")
    java.nio.file.Files.write(new java.io.File(d, "b.txt").toPath,
      "two".getBytes)
    val fp3 = DirFingerprint.of(spark, d.getAbsolutePath)
    assert(fp1 != fp3, "an added file must change the fingerprint")
    assert(DirFingerprint.of(spark, d.getAbsolutePath + "/nope") == "absent")
  }

  test("cachedStates rebuilds after the data directory changes") {
    val d = tmpDir("lt")
    java.nio.file.Files.write(new java.io.File(d, "data.bin").toPath,
      "v1".getBytes)
    var builds = 0
    def state() = {
      builds += 1
      Map("m" -> LinearTrain.State(builds.toLong, Vector(0L), Vector(0L),
        Vector(1L), BigInt(1), Vector(0L)))
    }
    val dir = d.getAbsolutePath
    val s1 = LinearTrain.cachedStates(spark, s"spec:$dir", dir)(state())
    val s2 = LinearTrain.cachedStates(spark, s"spec:$dir", dir)(state())
    assert(builds == 1, "unchanged dir must be served from cache")
    assert(s1("m").n == s2("m").n)
    // the in-session re-ingest: same path, new bytes
    java.nio.file.Files.write(new java.io.File(d, "data2.bin").toPath,
      "v2".getBytes)
    val s3 = LinearTrain.cachedStates(spark, s"spec:$dir", dir)(state())
    assert(builds == 2, "a changed dir must train fresh, not serve stale")
    assert(s3("m").n == 2L)
  }

  test("copurchase cut rebuilds after lineitem is re-ingested in place") {
    val d = tmpDir("cut")
    val dir = d.getAbsolutePath
    def writeLineitem(rows: Seq[(Long, Long)]): Unit = {
      val s = spark
      import s.implicits._
      rows.toDF("l_orderkey", "l_partkey")
        .withColumn("l_shipdate", lit("2024-01-01 00:00:00"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    // order 1 buys parts {1,2}: one pair (1,2) with support 1
    writeLineitem(Seq((1L, 1L), (1L, 2L)))
    val cut1 = graft.QueriesGraph
      .copurchaseEdges(spark, dir, keepSupport = true)
      .orderBy(col("a"), col("b")).collect().map(_.toSeq).toSeq
    assert(cut1 == Seq(Seq(1L, 2L, 1L)))
    // re-ingest AT THE SAME PATH with more data: pair (1,2) now support 2
    writeLineitem(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    val cut2 = graft.QueriesGraph
      .copurchaseEdges(spark, dir, keepSupport = true)
      .orderBy(col("a"), col("b")).collect().map(_.toSeq).toSeq
    assert(cut2 == Seq(Seq(1L, 2L, 2L)),
      "path-keyed stale cut served after in-place re-ingest")
  }

  test("trained k-means centroids rebuild after embeddings are re-ingested in place") {
    val d = tmpDir("cent")
    val dir = d.getAbsolutePath
    def writeEmbeddings(shift: Float): Unit = {
      val s = spark
      import s.implicits._
      (0L until 8L).map(i => (i, Array(i.toFloat + shift, 1.0f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    writeEmbeddings(0.0f)
    val c1 = graft.QueriesSimilarity.trainedCents(spark, dir, 2)
    val c1Again = graft.QueriesSimilarity.trainedCents(spark, dir, 2)
    assert(c1 == c1Again, "unchanged dir must serve the memoized centroids")
    // the in-session re-ingest: same path, different vectors — the
    // r7-era path-keyed memo would keep serving c1 here
    writeEmbeddings(100.0f)
    val c2 = graft.QueriesSimilarity.trainedCents(spark, dir, 2)
    assert(c1 != c2,
      "path-keyed stale centroids served after in-place re-ingest")
  }
}
