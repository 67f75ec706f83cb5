package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (cross join + per-query
  * heap); the IVF variant is the 100 TB path: assign every vector to its
  * nearest of C centroids (map-only after a centroid broadcast), then search
  * only within the query's cluster — candidate set shrinks ~C× for one extra
  * broadcast join. All arithmetic is double-precision higher-order column
  * functions (codegen'd, no UDFs), mirrored exactly by the DuckDB oracle.
  */
object Similarity {

  /** Sequential-fold dot product — same accumulation order as the oracle's
    * list_dot_product equivalent written as an explicit fold.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector, brute force.
    * `WindowGroupLimit` keeps only k rows per query below the rank, so the
    * shuffle after the cross join carries candidates, not the full product.
    * Deterministic tiebreak: (similarity desc, neighbor id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Cluster assignment: nearest centroid by cosine (ties → lowest centroid
    * id). Centroids are broadcast; assignment is map-only.
    */
  def assignClusters(vectors: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val c = broadcast(centroids.select(
      col(idCol).as("centroid_id"), col(vecCol).as("centv")))
    val w = Window.partitionBy(idCol)
      .orderBy(col("sim").desc, col("centroid_id").asc)
    vectors.select(col(idCol), col(vecCol))
      .crossJoin(c)
      .withColumn("sim", cosine(col(vecCol), col("centv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF (inverted-file) approximate top-k: search only the query's own
    * cluster. nprobe=1 here; widening to n clusters is the same join with
    * rank ≤ nprobe retained in [[assignClusters]].
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String, k: Int): DataFrame = {
    val assigned = assignClusters(vectors, centroids, idCol, vecCol)
    val q = assigned.filter(queryFilter)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("centroid_id").as("qc"))
    val c = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col("centroid_id").as("nc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, col("qc") === col("nc") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
