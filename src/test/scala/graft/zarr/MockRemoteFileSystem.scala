package graft.zarr

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A Hadoop FileSystem under a FOREIGN scheme+authority
  * (`mockfs://bucket/...`), backed by local disk. Registered via
  * `fs.mockfs.impl`, it exercises exactly the code path a remote
  * object store (s3a/gs/abfs) takes: scheme-based FileSystem
  * resolution from the (serialized) Configuration, authority-qualified
  * paths, and all I/O through the FileSystem API — no `java.io`
  * shortcuts can slip through, because the store's paths don't parse
  * as local files.
  *
  * Hadoop instantiates this reflectively, so it must stay a public
  * top-level class with a no-arg constructor.
  */
class MockRemoteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs://bucket")

  // RawLocalFileSystem's deprecated statuses lazy-load POSIX
  // permissions via `new java.io.File(uri)`, which rejects foreign
  // schemes; object stores don't have POSIX permissions anyway, so
  // return plain statuses like s3a does
  private def plain(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getPath)

  override def getFileStatus(f: Path): FileStatus = plain(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(plain)
}
