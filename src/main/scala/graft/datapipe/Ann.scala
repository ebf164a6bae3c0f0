package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * - [[cosine]] — codegen'd expression: zip_with + aggregate (sequential
  *   left-to-right sum, so the result is deterministic), no UDF.
  * - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *   against the full corpus; one pass, no shuffle of the corpus side.
  * - [[signLshTopK]] — scale path: bucket vectors by a d-bit sign
  *   hyperplane sketch and search only within the probe's bucket. At
  *   100 TB the bucket column is also the physical partition key, so a
  *   probe touches one partition instead of the corpus.
  * - [[nearDupPairs]] — embedding near-dup: all pairs above a cosine
  *   threshold, blocked by the same sign sketch.
  */
object Ann {

  /** Cosine similarity of two double arrays (deterministic fold). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** d-bit sign sketch: bit j = (v[j] > 0) — axis-aligned hyperplane LSH. */
  def signSketch(v: Column, bits: Int = 8): Column =
    (0 until bits).map(j =>
      when(element_at(v, j + 1) > 0.0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos"))
  }

  /** LSH-bucketed top-k: only candidates in the probe's sign bucket. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame, id: String,
                  vec: String, k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("bucket", signSketch(col("qv"), bits))
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
      .withColumn("bucket", signSketch(col("cv"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("nn_id"), col("cos"))
  }

  /** Nearest-centroid cell id for one vector against a literal codebook.
    * The codebook is driver-collected (an IVF coarse quantizer is tiny by
    * construction — k ≈ √N entries), so assignment is a pure projection:
    * a 100 TB corpus pass is scan+project with NO shuffle, and the cell
    * id doubles as the physical partition key of the index. Ties break
    * to the smallest cell id (cos rounded to 6 for engine parity).
    */
  def ivfAssign(v: Column, codebook: Seq[(Long, Seq[Double])]): Column = {
    val scored = array(codebook.sortBy(_._1).map { case (cid, cv) =>
      struct(
        round(cosine(v, typedlit(cv)), 6).as("cos"),
        lit(-cid).as("neg_cell"))
    }: _*)
    // struct max = lexicographic: highest cos, then highest -cell id
    (-array_max(scored).getField("neg_cell")).as("cell")
  }

  /** IVF (inverted-file) top-k: coarse-quantize corpus and probes to
    * their nearest-centroid cell, search only the probe's cell (nprobe=1).
    * The recall/speed knob is the codebook size; the corpus side stays
    * shuffle-free because [[ivfAssign]] is a projection and the per-cell
    * search reuses the broadcast-probe pattern of [[signLshTopK]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, codebook: Seq[(Long, Seq[Double])]): DataFrame = {
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
      .withColumn("cell", ivfAssign(col("cv"), codebook))
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("cell", ivfAssign(col("qv"), codebook))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("rank"), col("nn_id"), col("cos"))
  }

  /** Near-duplicate pairs by cosine, blocked by sign sketch (a near-dup
    * pair almost always shares the sketch; exact within-bucket scoring).
    */
  def nearDupPairs(corpus: DataFrame, id: String, vec: String,
                   threshold: Double, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
      .withColumn("bucket", signSketch(col("v"), bits))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), col("cos"))
  }
}
