package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** Quality evidence for the ANN scale path: the IVF-cell search must
  * recover most of the brute-force top-k (labels in the synthetic data
  * are genuine clusters, so recall should be high, not incidental).
  */
class AnnRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("KMeans-IVF ANN recall@5 vs brute force >= 0.8 (nprobe=3 of 8)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (cells, centroids) = Similarity.kmeansCells(emb, "embedding", k = 8)

    val queryRows = emb.filter(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding")).collect()
    val probes = queryRows.flatMap { r =>
      val qid = r.getLong(0)
      val vec = r.getSeq[Float](1)
      Similarity.probeCells(vec, centroids, nprobe = 3).map(c => (qid, c))
    }.toSeq.toDF("q_id", "cell")

    val queries = emb.filter(col("vec_id") < 30)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.topK(queries, emb, 5)
      .select(col("q_id"), col("vec_id"))

    // candidates = union of the probed cells, then exact rerank inside them
    val candidates = cells.join(probes, cells("cell") === probes("cell"))
      .select(probes("q_id"), cells("vec_id"), cells("embedding"))
    val reranked = candidates
      .join(queries, Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(Similarity.cosine(col("q_vec"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"))

    val hits = exact.join(reranked, Seq("q_id", "vec_id"), "inner").count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(f"KMeans-IVF recall@5 (nprobe=3/8) = $recall%.3f ($hits/$total)")
    assert(recall >= 0.8, f"recall $recall%.3f below threshold")
  }
}
