package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for the session memo artifacts (words, gram
  * keys, winnow selection, cluster labels, band index, LM counts, BM25
  * scores).
  *
  * The r4–r7 memos pin their artifact with `localCheckpoint` — executor
  * block storage, lost on executor death or session end. That is the
  * right default for a one-shot local run, but a production pipeline
  * STORES these tables (the q128 shard-register fold already proves the
  * economics: fold the stored artifact, never re-scan the corpus).
  * Setting
  *
  *   spark.graft.artifactDir=/path/to/store
  *
  * upgrades every memo to write-once parquet keyed by artifact name AND
  * a corpus signature (name/size/mtime of every data file under the
  * sfDir), so:
  *   - a FRESH session reuses the stored artifact with zero corpus
  *     scans (PlanShapeSpec pins q122/q125 cold-session plans reading
  *     the store, not documents.parquet);
  *   - executor loss replays from durable parquet instead of re-running
  *     the producer lineage (localCheckpoint's documented weakness at
  *     cluster scale);
  *   - a corpus change (new files, new mtimes) changes the signature,
  *     so a stale artifact can never serve — the staleness check is
  *     structural, not TTL-based. Stale signature dirs of the same
  *     artifact are deleted best-effort on the next write.
  *
  * Unset (the default), behavior is byte-identical to r7: the build
  * plan is localCheckpointed and session-scoped.
  */
object ArtifactStore {

  val DirConf = "spark.graft.artifactDir"

  def dirOf(s: SparkSession): Option[String] =
    Option(s.conf.get(DirConf, "")).filter(_.nonEmpty)

  /** Corpus signature: md5 over (path, size, mtime) of every regular
    * file under `d` (one directory level deep — the layout of the
    * testdata sfDirs: `<table>.parquet/part-*.parquet`). Listing a
    * corpus directory is metadata-only — no data read.
    */
  def corpusSig(d: String): String = {
    def filesUnder(f: File): Array[File] =
      Option(f.listFiles()).getOrElse(Array.empty)
    val files = filesUnder(new File(d)).sortBy(_.getPath).flatMap { f =>
      if (f.isDirectory) filesUnder(f).filter(_.isFile).sortBy(_.getPath)
      else Array(f)
    }
    val sig = files
      .map(f => s"${f.getPath}|${f.length}|${f.lastModified}")
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Load `name` from the store if a fresh copy exists, else run
    * `build`, persist it, and read the persisted copy back (so the
    * returned frame's lineage IS the store — consumers replay from
    * parquet, never from the producer plan). With no store configured,
    * pin with localCheckpoint exactly as the r7 memos did.
    */
  def loadOrBuild(s: SparkSession, d: String, name: String)
                 (build: => DataFrame): DataFrame =
    dirOf(s) match {
      case None => build.localCheckpoint()
      case Some(root) =>
        val base = new File(root, name)
        val path = new File(base, corpusSig(d))
        // striped in-JVM lock: two sessions in one JVM (parallel test
        // suites, notebook + job) building the same artifact must not
        // interleave overwrite writes; cross-JVM the _SUCCESS check
        // makes a lost race a harmless double write of identical data
        val lock = writeLocks.getOrElseUpdate(path.getPath, new Object)
        lock.synchronized {
          if (!new File(path, "_SUCCESS").isFile) {
            build.write.mode("overwrite").parquet(path.getPath)
            // prune artifacts of superseded corpus versions (best-effort;
            // concurrent readers of an old sig just rebuild next session)
            Option(base.listFiles()).getOrElse(Array.empty)
              .filter(f => f.isDirectory && f.getName != path.getName)
              .foreach(deleteTree)
          }
        }
        s.read.parquet(path.getPath)
    }

  private val writeLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Best-effort recursive delete (stale-sig pruning; test cleanup). */
  def deleteTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
    ()
  }
}
