package graft.zarr

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the per-create chmod fork.
  *
  * Without libhadoop (`NativeIO` unavailable — the common case in
  * containers and minimal images), `RawLocalFileSystem.setPermission`
  * shells out to `/bin/chmod` — one process fork per created file and
  * per created directory. Measured here (graft.tools.StoreProbe):
  * 16.4 ms per small-object write through the stock local FS vs
  * 0.36 ms with the chmod skipped — a 45× tax on every metadata doc,
  * zarr chunk, WARC archive, checkpoint and commit file the engine
  * writes locally.
  *
  * The chmod is redundant for this engine's usage: files created via
  * `FileOutputStream` / `File.mkdir` already carry the process-umask
  * modes (0644/0755 on a standard umask), which is exactly what
  * Hadoop's default `FsPermission` would chmod them to. Nothing in
  * the engine calls `setPermission` for effect. On clusters with
  * native Hadoop the override is equally harmless — it skips a
  * native chmod to the same mode.
  *
  * Registered per session via `spark.hadoop.fs.file.impl` (see
  * [[SparkSessions.tunedLocalFs]]); remote schemes (`s3a`, `mockfs`,
  * ...) are untouched.
  */
final class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

final class NoChmodLocalFileSystem
    extends LocalFileSystem(new NoChmodRawLocalFileSystem)

object SparkSessions {
  /** Hadoop-side key/value: route the `file` scheme through
    * [[NoChmodLocalFileSystem]].
    */
  val localFsKey: String = "fs.file.impl"
  val localFsImpl: String = classOf[NoChmodLocalFileSystem].getName

  /** (key, value) for Spark session builders (spark.hadoop. prefix). */
  val tunedLocalFs: (String, String) = (s"spark.hadoop.$localFsKey", localFsImpl)
}
