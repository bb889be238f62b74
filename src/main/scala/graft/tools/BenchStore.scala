package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Verify}
import graft.queries.ArtifactStore

/** The artifact store's measured economics (judge directive r9-#3):
  * the store had plan-shape proof (cold sessions read parquet, zero
  * corpus scans) but no NUMBER. This main runs the artifact-riding
  * query families in three labeled modes and emits one JSON line:
  *
  *   - `default`    — store off; the official Bench semantics (session
  *     memos live, producer-clear rules per repeat, min-of-N);
  *   - `store_cold` — store on, EMPTY store, memo maps cleared and the
  *     store wiped before every repeat: the one-time cost a pipeline
  *     pays to build + persist + read back each artifact (min-of-N of
  *     genuinely cold runs);
  *   - `store_warm` — store on, populated, memo maps cleared before
  *     every repeat: a FRESH session (new job, new JVM, post-failure
  *     restart) resolving every artifact from stored parquet instead
  *     of recomputing its lineage — localCheckpoint cannot serve this
  *     case at all.
  *
  * The claim under test: store_warm beats default on every family,
  * because default pays the producer computation once per session
  * while warm pays only a parquet scan of the (much smaller) artifact.
  *
  * Output: `BENCH_STORE.json` — {mode → {query → sec}, totals}.
  */
object BenchStore {

  /** The artifact-riding families named by the directive: passage dedup
    * (words), containment (grams), exact PPJoin pairs (produced by q94,
    * audited by q148, swept by q156), winnowing, contamination.
    */
  val Queries: Seq[String] = Seq(
    "q79_passage_dedup", "q86_containment_pairs",
    "q94_prefix_jaccard_pairs", "q122_winnow_fingerprints",
    "q125_contamination_attribution", "q148_lsh_recall",
    "q156_minhash_width_sweep",
    // round-9 artifact families: the per-doc feature table (producer +
    // two consumers) and the trained BPE vocabulary
    "q38_text_quality", "q48_curation_pipeline", "q110_quality_gate",
    "q169_bpe_tokenize")

  def clearMemos(): Unit = {
    graft.queries.GramMemo.clear()
    graft.queries.ClusterMemo.clear()
    graft.queries.ClusterMemo.clearSimhash()
    graft.queries.ClusterMemo.clearExactPairs()
    graft.queries.RetrievalMemo.clear()
    graft.queries.EmbMemo.clear()
    graft.queries.LmMemo.clear()
    graft.queries.FeatureMemo.clear()
    graft.queries.BpeMemo.clear()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.silenceIntendedGlobalWindowWarn()

    val store = java.nio.file.Files
      .createTempDirectory("graft-bench-store").toFile.getAbsolutePath

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc()
      dt
    }

    // codegen/JIT warmup outside any timed mode (REPRO.md protocol)
    clearMemos()
    Queries.foreach(q => try runOnce(q) catch { case _: Throwable => })

    def phase(mode: String): Seq[(String, Seq[Double])] = Queries.map { q =>
      val times = (1 to repeats).map { r =>
        mode match {
          case "default" =>
            // official Bench semantics: memos persist across queries;
            // PRODUCERS are cleared per repeat so they measure
            // computation — delegated to Bench's single rulebook so a
            // producer added there can never silently degrade this
            // mode's min-of-N into a memo-cache probe
            graft.Bench.clearProducerMemo(q)
          case "store_cold" =>
            clearMemos()
            ArtifactStore.deleteTree(new java.io.File(store))
          case "store_warm" =>
            clearMemos() // fresh-session simulation: only the store remains
        }
        System.err.println(s"[bench-store] $mode $q ($r/$repeats)")
        runOnce(q)
      }
      q -> times
    }

    clearMemos()
    val default = phase("default")

    spark.conf.set(ArtifactStore.DirConf, s"file:$store")
    val cold = phase("store_cold")
    // leave the last cold repeat's store in place; warm reads it
    val warm = phase("store_warm")
    spark.conf.set(ArtifactStore.DirConf, "")

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def block(rs: Seq[(String, Seq[Double])]): String =
      rs.map { case (k, v) =>
        "\"" + k + "\":{\"min\":" + num(v.min) + ",\"samples\":" +
          v.map(num).mkString("[", ",", "]") + "}"
      }.mkString("{", ",", "}")
    def total(rs: Seq[(String, Seq[Double])]): Double = rs.map(_._2.min).sum

    val line =
      s"""{"metric":"artifact_store_modes","unit":"sec","sf":"$sfDir","repeats":$repeats,""" +
        s""""totals":{"default":${num(total(default))},"store_cold":${num(total(cold))},"store_warm":${num(total(warm))}},""" +
        s""""default":${block(default)},"store_cold":${block(cold)},"store_warm":${block(warm)}}"""
    println(line)
    System.out.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_STORE.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench-store] could not write BENCH_STORE.json: $e")
    }
    ArtifactStore.deleteTree(new java.io.File(store))
    spark.stop()
  }
}
