package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Scratch profiling main for expression-level hotspots. */
object Profile {
  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val n = TextOps.normalize(col("text"))
    val sh = transform(sequence(lit(1), greatest(length(n) - 4, lit(1))),
      i => n.substr(i, lit(5)))

    time("normalize only") { run(docs.select(n.as("x"))) }
    time("shingles") { run(docs.select(sh.as("x"))) }
    time("shingles distinct") { run(docs.select(array_distinct(sh).as("x"))) }
    time("md5 per shingle") {
      run(docs.select(transform(array_distinct(sh),
        x => md5(to_binary(x, lit("utf-8")))).as("x")))
    }
    time("one minhash") {
      run(docs.select(array_min(transform(array_distinct(sh),
        x => substring(md5(to_binary(concat(lit("0"), lit("|"), x),
          lit("utf-8"))), 1, 8))).as("x")))
    }
    time("8 minhashes (materialized)") {
      run(graft.dedup.DedupOps.withMinhashSignature(docs, "text", 5, 8))
    }
    spark.stop()
  }
}
