package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Embedding-space near-duplicate detection as a reusable operator — the
  * vector twin of [[NearDup]]: sign-bit LSH buckets generate candidates,
  * exact cosine gates them.
  *
  * At 100 TB: candidate generation is an equi-self-join on the bucket id
  * (2^nPlanes cells); raising nPlanes trades recall for join fan-in.
  * Vectors are widened to double and normed ONCE; the bucket id becomes
  * the corpus partition key at scale so the join co-locates.
  */
object VectorNearDup {

  /** (id, v, nrm, bucket) — preprocessed vectors. Caller caches. */
  def prepared(vectors: DataFrame, idCol: String, embeddingCol: String,
               nPlanes: Int, dim: Int): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    vectors
      .select(col(idCol).as("vec_id"),
              expr(VectorOps.toDoubleExpr(embeddingCol)).as("v"))
      .withColumn("nrm", expr(VectorOps.normExpr("v")))
      .withColumn("bucket", expr(VectorOps.hyperplaneBucketExpr("v", nPlanes, dim)))
  }

  /** Same-bucket pairs with exact cosine >= `threshold`. */
  def pairs(prep: DataFrame, threshold: Double): DataFrame =
    prep.as("x").join(prep.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .withColumn("cosine",
        expr(VectorOps.fastDot("x.v", "y.v")) / (col("x.nrm") * col("y.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
              col("cosine"))

  /** Greedy survivor rule (see [[NearDup.survivors]]). */
  def survivors(vectors: DataFrame, id: Column, nearDupPairs: DataFrame): DataFrame =
    vectors.join(nearDupPairs.select(col("vec_b").as("drop_id")).distinct(),
      id === col("drop_id"), "left_anti")
}
