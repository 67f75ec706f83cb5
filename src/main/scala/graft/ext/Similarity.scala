package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (cross join + per-query
  * heap); the IVF variant is the 100 TB path: assign every vector to its
  * nearest of C centroids (map-only after a centroid broadcast), then search
  * only within the query's cluster — candidate set shrinks ~C× for one extra
  * broadcast join.
  *
  * Hot-path arithmetic uses the engine's native codegen expressions
  * ([[graft.functions.VectorExpressions]]): vectors are l2-normalized ONCE
  * per row (`vec_normalize`), so every pairwise cosine inside a join is a
  * single `vec_dot` primitive loop inside whole-stage codegen — the
  * interpreted `zip_with`/`aggregate` higher-order form was 40× slower at
  * sf0.1. The HOF forms remain below for contexts without registry access.
  */
object Similarity {

  /** Sequential-fold dot product (interpreted HOF form — oracle-identical
    * accumulation order; prefer `vec_dot` on hot paths).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** (id, unit-norm double vector) projection — the shared prologue of
    * every similarity operator. Registers the native functions idempotently.
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.select(col(idCol).as(idAs),
      call_function("vec_normalize", col(vecCol)).as(vecAs))
  }

  /** Exact top-k neighbors for each query vector, brute force.
    * `WindowGroupLimit` keeps only k rows per query below the rank, so the
    * shuffle after the cross join carries candidates, not the full product.
    * Deterministic tiebreak: (similarity desc, neighbor id asc).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("vec_dot", col("qv"), col("cv")))
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
    val v = normalized(vectors, idCol, vecCol, idCol, "nv")
    val c = broadcast(normalized(centroids, idCol, vecCol, "centroid_id", "centv"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("sim").desc, col("centroid_id").asc)
    v.crossJoin(c)
      .withColumn("sim", call_function("vec_dot", col("nv"), col("centv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("nv"), col("centroid_id"))
  }

  /** IVF (inverted-file) approximate top-k: search only the query's own
    * cluster. nprobe=1 here; widening to n clusters is the same join with
    * rank ≤ nprobe retained in [[assignClusters]].
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame,
      queryFilter: Column, idCol: String, vecCol: String, k: Int): DataFrame = {
    val assigned = assignClusters(vectors, centroids, idCol, vecCol)
    val q = assigned.filter(queryFilter)
      .select(col(idCol).as("query_id"), col("nv").as("qv"),
        col("centroid_id").as("qc"))
    val c = assigned.select(col(idCol).as("neighbor_id"), col("nv").as("cv"),
      col("centroid_id").as("nc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c, col("qc") === col("nc") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", call_function("vec_dot", col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
