package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.DedupOps
import graft.queries.{ClusterMemo, Tables}

/** Candidate-pair growth probe across the scale rungs — counts the LSH
  * band-bucket pair population WITHOUT materializing a single pair row
  * (Σ m·(m−1)/2 over bucket sizes, one aggregation per rung), so the
  * quadratic chance-collision term can be measured even at rungs where
  * the pair table itself no longer fits (the ×100 ladder run died in a
  * 80 GB sort spill — this probe is how we see what it was sorting).
  */
object ProbePairGrowth {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rungs = sys.env.getOrElse("SPARK_GRAFT_LADDER_RUNGS", "1,10,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- rungs) {
      val dir = if (n == 1) src else {
        val dst = s"target/scale$n/data"
        Scale10.inflate(spark, src, dst, n)
        dst
      }
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      import graft.dedup.MinHashSig
      val sigArr = column(MinHashSig(expression(col("text")),
        ClusterMemo.ShingleK, ClusterMemo.NumHashes))
      val sig = docs.select(col("doc_id"), sigArr.as("_sig"))
      val sigRef = (0 until ClusterMemo.NumHashes)
        .map(i => element_at(col("_sig"), i + 1))
      val bands = (0 until ClusterMemo.NumHashes / ClusterMemo.RowsPerBand)
        .map(b => DedupOps.bandKey(sigRef, b, ClusterMemo.RowsPerBand))
      val stats = sig.withColumn("band", explode(array(bands: _*)))
        .filter(col("band").isNotNull)
        .groupBy(col("band")).agg(count(lit(1)).as("m"))
        .filter(col("m") > 1)
        .agg(count(lit(1)).as("buckets"),
          sum(col("m") * (col("m") - 1) / 2).as("pairs_with_dups"),
          max(col("m")).as("max_bucket"),
          sum(when(col("m") > 1000, 1).otherwise(0)).as("buckets_gt_1000"))
        .collect()(0)
      val nd = docs.count()
      // distinct (id_a, id_b) pairs — the scored-pair table's row count —
      // counted over NARROW rows only (no signature/gram payload)
      val distinctPairs = sig.withColumn("band", explode(array(bands: _*)))
        .filter(col("band").isNotNull)
        .groupBy(col("band")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .distinct().count()
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => c2,
        expression => e2}
      import graft.dedup.NGramHashArray
      val avgGrams = docs
        .select(size(c2(NGramHashArray(e2(col("text")), ClusterMemo.NGram)))
          .as("g"))
        .agg(avg(col("g"))).collect()(0).getDouble(0)
      println(s"[pairgrowth] x$n docs=$nd buckets=${stats.get(0)} " +
        s"bandPairs=${stats.get(1)} maxBucket=${stats.get(2)} " +
        s"bucketsGt1000=${stats.get(3)} distinctPairs=$distinctPairs " +
        f"avgGrams=$avgGrams%.1f verifyShuffleGB=${
          distinctPairs * 2 * avgGrams * 8 / 1e9}%.1f")
      // what lives in the fattest buckets? (debug: sample member texts)
      if (sys.env.contains("SPARK_GRAFT_PROBE_BUCKET")) {
        val fat = sig.withColumn("band", explode(array(bands: _*)))
          .filter(col("band").isNotNull)
          .groupBy(col("band"))
          .agg(count(lit(1)).as("m"), collect_list(col("doc_id")).as("ids"))
          .orderBy(col("m").desc).limit(3)
          .select(col("band"), col("m"),
            slice(col("ids"), 1, 8).as("sample_ids"))
          .collect()
        fat.foreach { r =>
          val ids = r.getSeq[Long](2)
          println(s"[pairgrowth]   bucket m=${r.get(1)} sample ids=$ids")
          docs.filter(col("doc_id").isin(ids.take(4): _*))
            .select(col("doc_id"), substring(col("text"), 1, 80).as("head"))
            .collect()
            .foreach(t => println(
              s"[pairgrowth]     doc ${t.get(0)}: '${t.get(1)}'"))
        }
      }
    }
    spark.stop()
  }
}
