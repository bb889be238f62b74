package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local-disk Hadoop filesystem registered under the foreign scheme
  * `graftfs://` (see ArtifactStoreSpec): identical to
  * [[RawLocalFileSystem]] except it REPORTS its own scheme, so Hadoop's
  * `checkPath`/`makeQualified` accept `graftfs:` URIs. Code that
  * secretly routes through `java.io.File` (or assumes `file:`) breaks
  * against it — which is the point of the stand-in: it exercises the
  * same scheme-resolution chain an `hdfs://`/`s3a://` deployment would,
  * without a cluster in the sandbox.
  *
  * Statuses are rebuilt eagerly because RawLocalFileSystem's deprecated
  * lazy permission loader itself constructs `new java.io.File(uri)` —
  * the exact local-only assumption this stand-in exists to flush out.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")

  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, st.getAccessTime, null, null, null,
      st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}
