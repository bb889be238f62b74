package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Queries are materialized through the noop sink so the full plan
  * (including projections a count() would prune) is executed.
  */
object Bench {

  /** Producer-clear discipline shared by Bench and `tools.Adjudicate`:
    * artifact PRODUCERS measure the production computation on every
    * repeat (their session memo is cleared), consumers keep the memo
    * and measure the marginal post-producer cost — the economics the
    * memo exists to provide.
    */
  def clearProducerMemo(name: String): Unit = name match {
    // q50 must measure the clustering COMPUTATION on every repeat:
    // it populates the session ClusterMemo, which would otherwise
    // hand repeats 2..n the cached labels. Consumers (q61/q63) keep
    // the memo — their number is the marginal cost a pipeline pays
    // after the producer ran, which is the point of the memo.
    case "q50_neardup_clusters" => graft.queries.ClusterMemo.clear()
    // q46 is the embedding pair-table producer — same clearing rule;
    // q118 produces the trained-quantizer artifact q119 consumes
    case "q46_embedding_neardup" => graft.queries.EmbMemo.clear()
    case "q118_kmeans_lloyd" => graft.queries.EmbMemo.clearKmeans()
    // q122 produces the winnow-selection artifact q126/q127 consume
    case "q122_winnow_fingerprints" => graft.queries.GramMemo.clearWinnow()
    // q80 produces the decontamination gram-key artifact that
    // q125/q126 consume
    case "q80_contamination_fraction" => graft.queries.GramMemo.clearLeak()
    // q93 produces the session BM25 score table q109/q111/q129 consume
    case "q93_bm25_topk" => graft.queries.RetrievalMemo.clear()
    // q38 produces the per-doc curation-feature table
    // (quality/lang-id/token counts/fingerprint) the feature
    // consumers ride
    case "q38_text_quality" => graft.queries.FeatureMemo.clear()
    // q43 produces the SimHash pair artifact q136 consumes
    case "q43_simhash_hamming_pairs" =>
      graft.queries.ClusterMemo.clearSimhash()
    // q94 produces the exact ground-truth pair artifact q148 audits
    case "q94_prefix_jaccard_pairs" =>
      graft.queries.ClusterMemo.clearExactPairs()
    case _ => ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // the per-repeat producer clears below only empty the in-JVM memo
    // maps — with an artifact store configured, loadOrBuild would
    // re-serve the persisted parquet and q93/q43/q94 would silently
    // measure a store READ instead of the production computation. An
    // inherited session conf must not be able to corrupt board
    // semantics: store benchmarking is a separate, labeled protocol
    // (graft.tools.BenchStore).
    require(graft.queries.ArtifactStore.dirOf(spark).isEmpty,
      s"Bench measures production computation; ${graft.queries.ArtifactStore.DirConf} " +
        "must be unset (use graft.tools.BenchStore for store-mode numbers)")

    // absorb JVM/codegen/session warmup so per-query numbers reflect
    // steady-state execution rather than first-query startup. The
    // clustering lineage (MinHash → LSH → verify → components) generates
    // by far the most whole-stage-codegen classes; which earlier query
    // happened to compile them decided whether q50-family queries
    // measured 4 s or 40 s run-to-run, so warm that path explicitly.
    val warmups = SparkEntry.queries.take(1) ++
      SparkEntry.queries.get("q50_neardup_clusters").map("w" -> _)
    warmups.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // optional comma-separated name-prefix filter for targeted local runs
    // (e.g. SPARK_GRAFT_ONLY=q50,q32); absent = full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // repeat-min: the build host has documented multi-minute ~10x
    // slowdown windows that slide across the query list (REPRO.md) —
    // two rounds running the official bench ONCE per query measured the
    // host, not the code. The min over 3 runs is jitter-immune unless a
    // window outlasts all three, which the isolated re-run protocol in
    // REPRO.md then catches.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val results = selected.map { case (name, fn) =>
      val times = (1 to repeats).map { r =>
        clearProducerMemo(name)
        System.err.println(s"[bench] running $name ($r/$repeats)")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // untimed: broadcasts/shuffle state are reclaimed by the
        // ContextCleaner only when the driver GCs — without this, state
        // from 60+ prior queries piles up and the late queries pay the
        // GC wall
        System.gc()
        dt
      }
      name -> times
    }
    // Locale.ROOT: the f interpolator uses the default JVM locale, which
    // renders comma decimal separators (invalid JSON) on e.g. pt_BR
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v.min) }
      .mkString("{", ",", "}")
    // all repeats, not just the min: REPRO.md's jitter-window
    // adjudication (did a slowdown window cover all repeats of a query?)
    // becomes data-driven from the artifact instead of re-run-driven
    val samples = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(num).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"samples":$samples,"sf":"$sfDir"}"""
    // the r5 artifact arrived truncated MID-JSON (the driver captures a
    // bounded output tail): flush the line immediately, mirror it on
    // stderr, and persist it to a file so the artifact survives any
    // capture window. A SPARK_GRAFT_ONLY partial run writes a SEPARATE
    // file — a targeted re-run must not clobber the full board's
    // artifact (that overwrite once fed a 1-query "board" to the
    // adjudication tool)
    println(line)
    System.out.flush()
    System.err.println(line)
    val outFile =
      if (only.isDefined) "BENCH_ONLY_LAST.json" else "BENCH_LAST.json"
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: $e")
    }
    // COMPACT FINAL LINE (r12, VERDICT r11 item 2): the driver stores a
    // bounded 2000-char TAIL of the run output, so the full line above
    // (~15 KB at 167 queries) has arrived truncated mid-JSON every round
    // since r05 and the driver's `parsed` field has always been null —
    // no per-query PERF data, no scaling block. Emit, LAST, a compact
    // twin that always fits the window whole: the same total (same
    // methodology, same numbers) plus as many of the MOST EXPENSIVE
    // per-query mins (2 decimals) as fit ~1750 chars. Every query's full
    // min + all repeat samples remain in the full line just above, on
    // stderr, and in BENCH_LAST.json — nothing is dropped, this only
    // ADDS a driver-parseable summary.
    def num2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val skeleton =
      s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"full":"$outFile","queries":{},""" +
        s""""sf":"$sfDir"}"""
    var room = 1750 - skeleton.length
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    results.sortBy { case (_, v) => -v.min }.foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + num2(v.min)
      val cost = entry.length + (if (picked.isEmpty) 0 else 1)
      if (cost <= room) { picked += (k -> entry); room -= cost }
    }
    val compactQs = picked.sortBy(_._1).map(_._2).mkString("{", ",", "}")
    val compactLine =
      s"""{"metric":"total","value":${num(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"full":"$outFile",""" +
        s""""queries":$compactQs,"sf":"$sfDir"}"""
    println(compactLine)
    System.out.flush()
    System.err.println(compactLine)
    spark.stop()
  }
}
