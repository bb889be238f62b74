package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Percentiles
object ProbeFm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    graft.queries.FeatureMemo.features(spark, d).count()
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    for (i <- 1 to 3) {
      t(s"q62-NEW full $i") {
        val toks = graft.queries.FeatureMemo.features(spark, d)
          .select(col("source"), col("n_tokens_ws").as("n_tokens"))
        val quant = Percentiles.exactByHistogram(toks, "source", "n_tokens", ps)
        val sums = toks.groupBy(col("source")).agg(
          sum(col("n_tokens")).as("total_tokens"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("mean_tokens"))
        quant.join(sums, Seq("source")).collect()
      }
      t(s"q62-OLD full $i") {
        val toks = graft.queries.Tables.documents(spark, d)
          .select(col("source"), graft.text.TextOps.tokenCountWs(col("text")).as("n_tokens"))
        val quant = Percentiles.exactByHistogram(toks, "source", "n_tokens", ps)
        val sums = toks.groupBy(col("source")).agg(
          sum(col("n_tokens")).as("total_tokens"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6).as("mean_tokens"))
        quant.join(sums, Seq("source")).collect()
      }
    }
    spark.stop()
  }
}
