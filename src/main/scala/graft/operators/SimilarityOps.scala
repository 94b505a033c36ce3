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

  /** Left-to-right double-precision dot product of two numeric arrays —
    * the native [[graft.functions.DotProduct]] expression (fused codegen
    * loop, bit-identical to the `aggregate(zip_with(...))` fold it
    * replaced).
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ties broken by corpus id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms hoisted per ROW (computed once, carried through the join)
    // instead of per scored pair — same sqrt of the same fold, so the
    // cosine is bit-identical; per-pair work drops to one dot product
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n"))).as("cos"))
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
      norm(col("embedding")).as("q_n"), col("label").as("cell"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"), col("label").as("cell"))
    val scored = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .select(col("q_id"), col("c_id"), col("cos"),
        row_number().over(w).cast(LongType).as("rank"))
      .filter(col("rank") <= k)
  }

  /** Deterministic coarse centroids for IVF: the `nCells` lowest-id
    * corpus vectors, as (seed_id, s_emb). Any coarse quantizer works for
    * IVF; seeding from fixed ids keeps the whole pipeline reproducible
    * and SQL-oracle-expressible. Refine with [[lloydIterate]] when the
    * data is clusterable.
    */
  def seedCentroids(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("seed_id"),
        transform(col(embCol), _.cast(DoubleType)).as("s_emb"))

  /** The centroid set folded into ONE broadcastable row holding a sorted
    * (seed_id, s_emb) array — the "model" that assignment projects over.
    */
  private def centroidArray(centroids: DataFrame): DataFrame =
    centroids.agg(sort_array(
      collect_list(struct(col("seed_id"), col("s_emb")))).as("cents"))

  /** Nearest-centroid id for `emb` — a pure projection folding over the
    * centroid array (argmax cosine, ties to the lower seed_id). This is
    * the 100 TB-critical piece: corpus assignment needs NO shuffle and NO
    * per-vector join, just a broadcast of O(nCells·dim) model state.
    */
  private def nearestCell(cents: Column, emb: Column): Column =
    aggregate(cents,
      struct(lit(-1L).as("cell"), lit(-2.0).as("best")),
      (acc, s) => {
        val c = cosine(emb, s.getField("s_emb"))
        when(c > acc.getField("best"),
          struct(s.getField("seed_id").as("cell"), c.as("best")))
          .otherwise(acc)
      }).getField("cell")

  /** One Lloyd iteration: assign every corpus vector to its nearest
    * centroid, then recompute each centroid as the per-dimension mean of
    * its cell. Fully declarative — assignment is a projection, the
    * recompute is one partial-aggregated groupBy of nCells rows; the
    * centroid "model" never leaves the cluster.
    */
  def lloydIterate(corpus: DataFrame, centroids: DataFrame, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val assigned = corpus
      .crossJoin(broadcast(centroidArray(centroids)))
      .select(col(idCol),
        nearestCell(col("cents"), col(embCol)).as("seed_id"),
        col(embCol).as("e"))
    val means = (0 until dim).map(i =>
      avg(element_at(col("e"), i + 1).cast(DoubleType)).as(s"m$i"))
    assigned.groupBy(col("seed_id"))
      .agg(means.head, means.tail: _*)
      .select(col("seed_id"),
        array((0 until dim).map(i => col(s"m$i")): _*).as("s_emb"))
  }

  /** End-to-end IVF approximate top-k over raw embeddings: corpus vectors
    * are assigned to their nearest coarse centroid (projection, no
    * shuffle); each query probes its `nProbe` nearest cells (multi-probe)
    * and scores only those cells' vectors. Scored pairs shrink by
    * ~nProbe/nCells at the classic IVF recall cost; nProbe = nCells
    * degrades gracefully to exact brute force.
    */
  /** Seeded centroids refined by `lloydIters` k-means iterations — the
    * model-fitting step [[ivfTopK]] and [[semanticDedup]] share.
    */
  def fitCentroids(corpus: DataFrame, nCells: Int, lloydIters: Int,
      dim: Int, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    var cents = seedCentroids(corpus, nCells, idCol, embCol)
    (0 until lloydIters).foreach { _ =>
      cents = lloydIterate(corpus, cents, dim, idCol, embCol)
    }
    cents
  }

  /** Every corpus vector with its hoisted norm and nearest-centroid cell:
    * (id, e, n, cell). The broadcast-model projection both IVF and
    * semantic dedup assign with — the corpus never shuffles for it.
    */
  private def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String): DataFrame =
    corpus
      .crossJoin(broadcast(centroidArray(centroids)))
      .select(col(idCol).as("id"), col(embCol).as("e"),
        norm(col(embCol)).as("n"),
        nearestCell(col("cents"), col(embCol)).as("cell"))

  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val assigned = assignCells(corpus, centroids, idCol, embCol)
      .select(col("id").as("c_id"), col("e").as("c_emb"),
        col("n").as("c_n"), col("cell"))
    // query side is small: rank all cells per query, keep nProbe
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("scos").desc, col("seed_id"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("seed_id"),
        cosine(col("q_emb"), col("s_emb")).as("scos"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("q_id"), col("q_emb"), norm(col("q_emb")).as("q_n"),
        col("seed_id").as("cell"))
    val scored = probes.join(assigned, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .select(col("q_id"), col("c_id"), col("cos"),
        row_number().over(w).cast(LongType).as("rank"))
      .filter(col("rank") <= k)
  }

  /** IVF top-k with deterministic seeded centroids (the oracle-checked
    * form); `lloydIters > 0` refines the centroids first (k-means-lite).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int, nProbe: Int, lloydIters: Int = 0, dim: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    ivfTopKWith(queries, corpus,
      fitCentroids(corpus, nCells, lloydIters, dim, idCol, embCol),
      k, nProbe, idCol, embCol)

  /** Random-hyperplane LSH bucket id (`bits` sign bits) — the embedding
    * analogue of MinHash banding: vectors sharing a bucket are cosine-close
    * with high probability. Hyperplanes are deterministic pseudo-random
    * unit-free vectors derived from wordHash(seed, dim-index) so the SQL
    * oracle can reproduce them.
    */
  def rpLshBucket(emb: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { b =>
      // plane component p_i in {-1, +1} from a deterministic hash;
      // the projection is a dot product against the sign vector
      val proj = dot(emb, planeSigns(b, dim))
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** RP-LSH bucket-join top-k with multi-probe: corpus vectors bucket by
    * their `bits` hyperplane signs (one projection per vector, no
    * shuffle); each query probes its own bucket plus, at
    * `probeRadius = 1`, every bucket one sign-flip away (the classic
    * multi-probe trade: bits+1 probed buckets recover neighbors that
    * straddle one hyperplane). Candidates come from the bucket equi-join
    * — expected corpus fraction scored ≈ (probed buckets) / 2^bits.
    */
  def rpLshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, bits: Int = 6, probeRadius: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1, "probeRadius 0 or 1")
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"),
      norm(col(embCol)).as("c_n"),
      rpLshBucket(col(embCol), dim, bits).as("bucket"))
    val qb = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
      norm(col(embCol)).as("q_n"),
      rpLshBucket(col(embCol), dim, bits).as("qb"))
    val probeList =
      if (probeRadius == 0) array(col("qb"))
      else array(col("qb") +: (0 until bits).map(i =>
        col("qb").bitwiseXOR(lit(1L << i))): _*)
    val probes = qb.select(col("q_id"), col("q_emb"), col("q_n"),
      explode(probeList).as("bucket"))
    val scored = probes.join(c, "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored
      .select(col("q_id"), col("c_id"), col("cos"),
        row_number().over(w).cast(LongType).as("rank"))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding modality of
    * the dedup family (alongside exact / MinHash-LSH / SimHash):
    * candidate pairs come from an RP-LSH bucket SELF-join (equal bucket,
    * plus one sign-flip apart at `probeRadius = 1`), then exact cosine
    * verification against `threshold`. Never an all-pairs product —
    * expected scored fraction ≈ (bits + 1) / 2^bits of the corpus pairs;
    * each qualifying pair meets in exactly one (probe, bucket) key, so
    * no post-join dedup is needed. Hot-bucket exposure (a dense embedding
    * cluster landing in one bucket) is bounded by `saltTarget` > 0:
    * size-aware salting splits each bucket's BUILD side into
    * ceil(|bucket|/saltTarget) groups and replicates probe rows per
    * group — per-join-key build rows stay ~saltTarget regardless of the
    * skew ratio, the same key-level guard [[DedupOps.simhashPairs]] uses.
    */
  def embedNearDupPairs(corpus: DataFrame, threshold: Double,
      dim: Int = 64, bits: Int = 6, probeRadius: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding",
      saltTarget: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 1, "probeRadius 0 or 1")
    val c = corpus.select(col(idCol).as("id_b"), col(embCol).as("emb_b"),
      norm(col(embCol)).as("n_b"),
      rpLshBucket(col(embCol), dim, bits).as("bucket"))
    val a = corpus.select(col(idCol).as("id_a"), col(embCol).as("emb_a"),
      norm(col(embCol)).as("n_a"),
      rpLshBucket(col(embCol), dim, bits).as("ab"))
    val probeList =
      if (probeRadius == 0) array(col("ab"))
      else array(col("ab") +: (0 until bits).map(i =>
        col("ab").bitwiseXOR(lit(1L << i))): _*)
    val probes = a.select(col("id_a"), col("emb_a"), col("n_a"),
      explode(probeList).as("bucket"))
    val joined =
      if (saltTarget > 0) {
        val (ps, cs) = saltedBucketSides(probes, c, saltTarget)
        ps.join(cs, Seq("bucket", "__salt"))
      } else probes.join(c, "bucket")
    joined
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("n_a") * col("n_b"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Size-aware salted sides over the RP-LSH bucket join: build rows
    * (`id_b`) hash into one of ceil(|bucket|/saltTarget) salt groups,
    * probe rows replicate across them — every (probe, build) pair still
    * meets exactly once, now under (bucket, __salt). The bucket-size agg
    * is 2^bits rows at most: broadcast. Exposed for the skew spec.
    */
  private[graft] def saltedBucketSides(probes: DataFrame, c: DataFrame,
      saltTarget: Int): (DataFrame, DataFrame) = {
    val sizes = c.groupBy(col("bucket")).agg(count(lit(1)).as("__bn"))
    def nsalt = ceil(col("__bn").cast("double") / saltTarget).cast("int")
    val cs = c.join(broadcast(sizes), Seq("bucket"))
      .withColumn("__salt",
        pmod(xxhash64(col("id_b")), nsalt.cast("long")).cast("int"))
      .drop("__bn")
    val ps = probes.join(broadcast(sizes), Seq("bucket"))
      .withColumn("__salt", explode(sequence(lit(0), nsalt - 1)))
      .drop("__bn")
    (ps, cs)
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): partition the embedding
    * space with k-means cells, then inside each cell mark every vector
    * that has a LOWER-id neighbor at cosine >= `threshold` as a semantic
    * duplicate (the lowest-id member of any near-dup group survives —
    * deterministic, no tie policy needed). Returns one row per corpus
    * vector: (idCol, cell, is_dup).
    *
    * Where [[embedNearDupPairs]] buckets by random hyperplanes (recall
    * driven by probing), this is the paper's clustering form: the
    * corpus-size-quadratic pair search becomes Σ|cell|², driven by
    * nCells. Scale: assignment is a pure projection over a broadcast
    * O(nCells·dim) centroid model — the corpus never shuffles for it;
    * the pair search is one cell-keyed self-join, and a hot cell (dense
    * region) caps its per-key build rows at `saltTarget` via the same
    * size-aware salting the RP-LSH join uses. `lloydIters` > 0 refines
    * the seeded centroids first ([[lloydIterate]]).
    */
  def semanticDedup(corpus: DataFrame, threshold: Double, nCells: Int = 8,
      lloydIters: Int = 0, dim: Int = 64,
      idCol: String = "vec_id", embCol: String = "embedding",
      saltTarget: Int = 0): DataFrame = {
    val assigned = assignCells(corpus,
      fitCentroids(corpus, nCells, lloydIters, dim, idCol, embCol),
      idCol, embCol)
    // three consumers (both self-join sides + the final left join) — the
    // nCells-cosine assignment fold runs once, not three times
    CacheOnce.untilConsumed(assigned)
    // cell-keyed self-join, lower ids on the build side ("bucket"/"id_b"
    // naming so the shared salting helper applies verbatim)
    val probes = assigned.select(col("cell").as("bucket"),
      col("id").as("id_a"), col("e").as("e_a"), col("n").as("n_a"))
    val builds = assigned.select(col("cell").as("bucket"),
      col("id").as("id_b"), col("e").as("e_b"), col("n").as("n_b"))
    val joined =
      if (saltTarget > 0) {
        val (ps, cs) = saltedBucketSides(probes, builds, saltTarget)
        ps.join(cs, Seq("bucket", "__salt"))
      } else probes.join(builds, "bucket")
    val dups = joined
      .filter(col("id_b") < col("id_a"))
      .filter(dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))
        >= threshold)
      .select(col("id_a").as("id")).distinct()
    assigned
      .join(dups.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

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
