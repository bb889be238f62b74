package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Scale design: the brute-force path is the CORRECTNESS baseline (query
  * set × corpus via broadcast of the small query side — never corpus ×
  * corpus); the scale path is IVF-style partition pruning: join only within
  * a coarse cluster (here the `label` column as the quantizer cell), which
  * turns the O(Q·N) scan into O(Q·N/cells) after one shuffle on the cell
  * id. All arithmetic is float→double cast then sequential fold — the exact
  * dot product any engine reproduces.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` is expected to be small (broadcast); ties break on
    * neighbor id after rounding, so ranking is engine-reproducible.
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           qId: String = "q_id", cId: String = "vec_id",
           qVec: String = "q_vec", cVec: String = "embedding"): DataFrame = {
    val joined = corpus.join(broadcast(queries), col(qId) =!= col(cId))
      .withColumn("sim", round(cosine(col(qVec), col(cVec)), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId).asc)
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("sim"), col("rnk"))
  }

  /** IVF-style top-k: restrict candidates to the query's coarse cell
    * (one equi-join shuffle on the cell id instead of a full scan per
    * query — the 100 TB-shaped variant).
    */
  def topKWithinCell(queries: DataFrame, corpus: DataFrame, k: Int,
                     cell: String, qId: String = "q_id",
                     cId: String = "vec_id", qVec: String = "q_vec",
                     cVec: String = "embedding"): DataFrame = {
    val joined = corpus.join(broadcast(queries), Seq(cell))
      .filter(col(qId) =!= col(cId))
      .withColumn("sim", round(cosine(col(qVec), col(cVec)), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId).asc)
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cell), col(cId), col("sim"), col("rnk"))
  }
}
