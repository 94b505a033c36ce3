package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline, and a bucket-pruned (IVF-style)
  * variant as the scale path.
  *
  * Scale design: brute force is a broadcast of the (small) query set
  * against the full corpus — a map-only cross product with per-partition
  * top-k via window rank; cost is O(|corpus| * |queries| * dim) FLOPs and
  * one shuffle of |queries| * k rows. The bucketed variant prunes the
  * corpus to the query's coarse cell (here the pre-assigned `label`
  * centroid id, standing in for a nearest-centroid assignment) before
  * scoring — the classic IVF recall/cost trade.
  *
  * Dot products run in double precision with a left-to-right fold —
  * deterministic and bit-identical to the SQL oracle's list_dot_product.
  */
object SimilarityOps {

  /** Left-to-right double-precision dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ties broken by corpus id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .select(col("q_id"), col("c_id"), col("cos"),
        row_number().over(w).cast(LongType).as("rank"))
      .filter(col("rank") <= k)
  }

  /** IVF-style bucketed top-k: candidates restricted to the query's coarse
    * cell (`label`), cutting scored pairs by ~|cells|× at some recall cost.
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("label").as("cell"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      col("label").as("cell"))
    val scored = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .select(col("q_id"), col("c_id"), col("cos"),
        row_number().over(w).cast(LongType).as("rank"))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (`bits` sign bits) — the embedding
    * analogue of MinHash banding: vectors sharing a bucket are cosine-close
    * with high probability. Hyperplanes are deterministic pseudo-random
    * unit-free vectors derived from wordHash(seed, dim-index) so the SQL
    * oracle can reproduce them.
    */
  def rpLshBucket(emb: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { b =>
      // plane component p_i in {-1, +1} from a deterministic hash
      val proj = aggregate(
        zip_with(emb, planeSigns(b, dim), (x, p) => x.cast(DoubleType) * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** {-1,+1} signs for pseudo-random hyperplane `b` over `dim` dims. */
  private[operators] def planeSigns(b: Int, dim: Int): Column =
    array((0 until dim).map { i =>
      lit(if (planeSign(b, i)) 1.0 else -1.0)
    }: _*)

  /** Deterministic sign: parity of md5(b:i) first hex digit. Mirrors the
    * SQL oracle expression ('0x'||substr(md5(...),1,1))::INT % 2.
    */
  private[operators] def planeSign(b: Int, i: Int): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$b:$i".getBytes("UTF-8"))
    (hex(0) & 0xf0) >> 4 match { case d => d % 2 == 0 }
  }
}
