package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — north-star extension.
  *
  *  - [[cosine]] / [[dot]] / [[l2Norm]]: built from `zip_with` +
  *    `aggregate` higher-order functions over double-cast elements —
  *    deterministic left-to-right folds, no UDFs.
  *  - [[bruteForceTopK]]: exact top-k for a bounded query set — the
  *    correctness baseline. Queries are broadcast; the corpus streams;
  *    per-query rank via window. Cost O(|Q|·|corpus|) — fine when |Q| is
  *    small, which is the only honest use of brute force at 100 TB.
  *  - [[srpSignature]] / [[lshTopK]]: signed-random-projection LSH
  *    (Charikar '02): deterministic fixed-seed hyperplanes, bucket join
  *    on signature bands, exact re-rank *within* candidates. The scale
  *    path: shuffle ∝ bucket sizes, never |Q|×|corpus|.
  *
  * Norms are computed once per vector (a Project before the join), never
  * per pair.
  */
object Similarity {

  /** Elementwise dot product. The float-array fast path is a codegen'd
    * native expression ([[graft.functions.VectorExprs.FloatVecDot]]); it
    * accumulates left-to-right in double exactly like the higher-order-
    * function formulation ([[dotHof]]) it replaces, so results are
    * bit-identical — the HOF version stays as the generic/reference
    * implementation and for equality tests.
    */
  def dot(a: Column, b: Column): Column = VectorExprs.float_dot(a, b)

  /** Reference implementation via builtin higher-order functions (works
    * on any numeric array type, interpreted — slow on hot paths).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine via precomputed norms (for joins where norms are computed
    * once per side).
    */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ranked by (cosine desc, id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), l2Norm(col(vecCol)).as("__qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), l2Norm(col(vecCol)).as("__cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineWithNorms(dot(col("__qv"), col("__cv")),
        col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Deterministic pseudo-random hyperplanes: `numPlanes` × `dim` doubles
    * from a fixed-seed PRNG, identical across executors and runs.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Signed-random-projection signature: bit i = sign(v · h_i). Returns
    * a long (supports up to 63 planes).
    */
  def srpSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    VectorExprs.srp_signature(vec, planes)

  /** Split an SRP signature into bands for bucketing. */
  private def bandCols(sig: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { bi =>
      struct(lit(bi).as("band_id"),
        shiftright(sig, bi * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("band_key"))
    }: _*)

  /** LSH-bucketed approximate top-k: queries and corpus are signed with
    * the same hyperplanes; candidates = corpus vectors sharing ≥1 band
    * with the query; exact cosine re-rank within candidates. Recall
    * depends on bands×bits vs target similarity; measured against
    * [[bruteForceTopK]] in the test suite.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 16, bands: Int = 4,
              seed: Long = 42L): DataFrame = {
    require(numPlanes % bands == 0, "bands must divide numPlanes")
    val bitsPerBand = numPlanes / bands
    // dim read lazily from the first corpus row is an action; instead the
    // caller's schema fixes dim=64 (FIXTURES.md) — derive from data only
    // when metadata is absent.
    val dim = 64
    val planes = hyperplanes(numPlanes, dim, seed)

    def signed(df: DataFrame, id: String, vecAs: String, normAs: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vecAs),
        l2Norm(col(vecCol)).as(normAs),
        srpSignature(col(vecCol), planes).as("__sig"))

    // candidate generation carries ONLY ids through the band join and the
    // distinct — the vector payload re-joins after dedup, so the shuffle
    // moves (long, long) pairs, not 64-float arrays
    val q = signed(queries, "query_id", "__qv", "__qn")
    val c = signed(corpus, "neighbor_id", "__cv", "__cn")
    val qBands = q.select(col("query_id"),
      explode(bandCols(col("__sig"), bands, bitsPerBand)).as("b"))
      .select(col("query_id"), col("b.band_id"), col("b.band_key"))
    val cBands = c.select(col("neighbor_id"),
      explode(bandCols(col("__sig"), bands, bitsPerBand)).as("b"))
      .select(col("neighbor_id"), col("b.band_id"), col("b.band_key"))

    val candidatePairs = qBands.join(cBands, Seq("band_id", "band_key"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()

    val candidates = candidatePairs
      .join(q.select(col("query_id"), col("__qv"), col("__qn")), "query_id")
      .join(c.select(col("neighbor_id"), col("__cv"), col("__cn")), "neighbor_id")
      .withColumn("score", cosineWithNorms(dot(col("__qv"), col("__cv")),
        col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Embedding near-duplicate pairs: corpus self-match with cosine ≥
    * threshold, via SRP banding (no quadratic pass).
    */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, numPlanes: Int = 16, bands: Int = 8,
                     seed: Long = 42L): DataFrame = {
    require(numPlanes % bands == 0, "bands must divide numPlanes")
    val bitsPerBand = numPlanes / bands
    val dim = 64
    val planes = hyperplanes(numPlanes, dim, seed)
    val signed = corpus.select(col(idCol), col(vecCol).as("__v"),
      l2Norm(col(vecCol)).as("__n"), srpSignature(col(vecCol), planes).as("__sig"))
    // id-only band join + distinct, then re-join the vectors (see lshTopK)
    val exploded = signed
      .select(col(idCol), explode(bandCols(col("__sig"), bands, bitsPerBand)).as("b"))
      .select(col(idCol), col("b.band_id"), col("b.band_key"))
    val l = exploded.select(col("band_id"), col("band_key"), col(idCol).as("id_a"))
    val r = exploded.select(col("band_id"), col("band_key"), col(idCol).as("id_b"))
    val pairs = l.join(r, Seq("band_id", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(signed.select(col(idCol).as("id_a"), col("__v").as("__va"), col("__n").as("__na")), "id_a")
      .join(signed.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb")), "id_b")
      .withColumn("score", cosineWithNorms(dot(col("__va"), col("__vb")),
        col("__na"), col("__nb")))
      .where(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN scale
    * path next to LSH. A coarse quantizer of `numCells` centroids
    * partitions the corpus into cells (the "inverted lists"); each query
    * probes only its `nprobe` nearest cells and exact-reranks the
    * vectors in those cells.
    *
    * Centroids here are a deterministic sample (the `numCells`
    * lowest-id corpus vectors) — a k-means trainer would slot into the
    * same plumbing, but sampled centroids keep the operator seed-free
    * and oracle-reproducible. The centroid table is tiny model state:
    * collected once on the driver and inlined as literal arrays, so
    * cell assignment is a map-only Project over the corpus (no join, no
    * shuffle). At 100 TB the only shuffle is the probe⋈cell equi-join,
    * whose right side carries ~|corpus|·nprobe/numCells rows per query,
    * and the final per-query top-k runs on [[graft.plans.TopKPerKey]]
    * (bounded heaps, no sort).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numCells: Int = 16,
              nprobe: Int = 4): DataFrame = {
    val centroids: Array[(Seq[Float], Double)] = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(numCells)
      .collect().map { r =>
        val v = r.getSeq[Float](1)
        (v, math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
      }
    // per-row array of (similarity-to-centroid, cell-index) structs; the
    // row's own norm is a positive constant across the comparison so
    // dot/centroidNorm ranks identically to full cosine
    def cellSims(vec: Column): Column = array(centroids.zipWithIndex.map {
      case ((cv, cn), i) =>
        struct((dot(vec, array(cv.map(lit): _*)) / lit(cn)).as("sim"),
          lit(i).as("cell"))
    }: _*)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      l2Norm(col(vecCol)).as("__cn"),
      array_max(cellSims(col(vecCol))).getField("cell").as("cell"))
    val qProbes = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), l2Norm(col(vecCol)).as("__qn"),
      explode(slice(reverse(array_sort(cellSims(col(vecCol)))), 1, nprobe))
        .as("probe"))
      .select(col("query_id"), col("__qv"), col("__qn"),
        col("probe.cell").as("cell"))

    val candidates = broadcast(qProbes).join(c, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineWithNorms(dot(col("__qv"), col("__cv")),
        col("__qn"), col("__cn")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    graft.plans.TopKPerKey.topKPerKey(candidates, Seq("query_id"),
      Seq("score" -> true, "neighbor_id" -> false), k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }
}
