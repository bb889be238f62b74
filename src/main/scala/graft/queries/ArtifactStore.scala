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
    * file under `d`, RECURSIVELY — nested layouts (Hive-partitioned
    * `table/date=.../part.parquet`) must contribute their leaf files,
    * not just the partition directory entries (a directory's own mtime
    * does not reliably change when a file inside is rewritten in
    * place). Listing is metadata-only — no data read.
    */
  def corpusSig(d: String): String = {
    def walk(f: File): Array[File] = {
      val children = Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getPath)
      children.flatMap(c => if (c.isDirectory) walk(c) else Array(c))
    }
    val sig = walk(new File(d))
      .map(f => s"${f.getPath}|${f.length}|${f.lastModified}")
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Corpus-identity key: artifacts of DIFFERENT corpora sharing one
    * store must not collide or prune each other — the signature alone
    * encodes identity AND version, so pruning by sibling sig would
    * delete a sibling corpus's artifacts (and break any live plan
    * reading them). Keying the directory by the corpus path keeps
    * pruning scoped to versions of the SAME corpus.
    */
  private def corpusKey(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(new File(d).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

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
        val path = pathFor(root, d, name)
        val base = path.getParentFile
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

  /** The store path of artifact `name` for corpus `d`:
    * `<root>/<name>/<corpus key>/<corpus signature>`.
    */
  def pathFor(root: String, d: String, name: String): File =
    new File(new File(new File(root, name), corpusKey(d)), corpusSig(d))

  private val writeLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Best-effort recursive delete (stale-sig pruning; test cleanup). */
  def deleteTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete()
    ()
  }
}
