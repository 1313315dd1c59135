package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only filesystem (scheme `fakes3`) whose
  * `create(overwrite = false)` is a deliberate CHECK-THEN-ACT: a HEAD
  * existence probe followed by an UNCONDITIONAL put — the shape stock
  * s3a has historically given Hadoop's create-no-overwrite contract.
  * Backed by the local filesystem (paths are used verbatim as local
  * paths), it exists so ManifestSwapSpec can prove two things about
  * [[graft.streaming.ManifestSwap]]'s object-store commit branch
  * (round-13 verdict ask #2 / ADVICE high):
  *
  *  1. WITHOUT the conditional-create gate (i.e. with the operator
  *     falsely attesting support), two racing committers both "win"
  *     the same manifest number and the later PUT silently replaces
  *     the earlier payload — a LOST COMMIT, demonstrated live via the
  *     [[CheckThenActFs.betweenCheckAndPut]] hook that lands a rival
  *     commit inside the check→put window;
  *  2. WITH the gate (the default), the protocol REFUSES this
  *     filesystem loudly before writing anything.
  *
  * Only the operations ManifestSwap's metadata path uses are
  * implemented; data-plane writes (Spark jobs) never run against it. */
class CheckThenActFs extends FileSystem {
  private val local = new RawLocalFileSystem()
  private var myUri: URI = URI.create("fakes3:///")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
    myUri = URI.create(name.getScheme + ":///")
  }

  override def getScheme: String = "fakes3"
  override def getUri: URI = myUri
  override protected def checkPath(path: Path): Unit = ()

  private def loc(p: Path): Path = new Path("file", null, p.toUri.getPath)
  private def back(p: Path): Path = new Path("fakes3", null, p.toUri.getPath)
  private def reStat(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      st.getPermission, st.getOwner, st.getGroup, back(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(loc(f), bufferSize)

  override def create(f: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      // the HEAD: existence checked here...
      if (local.exists(loc(f)))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          f.toString)
      // ...window in which a rival can land the same object...
      Option(CheckThenActFs.betweenCheckAndPut.getAndSet(null))
        .foreach(_.run())
    }
    // ...and the PUT is unconditional: it silently replaces whatever
    // appeared since the check — the s3a hazard under test
    local.create(loc(f), permission, true, bufferSize, replication,
      blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    local.append(loc(f), bufferSize, progress)
  override def rename(src: Path, dst: Path): Boolean =
    local.rename(loc(src), loc(dst))
  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(loc(f), recursive)
  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(loc(f)).map(reStat)
  override def setWorkingDirectory(dir: Path): Unit =
    local.setWorkingDirectory(loc(dir))
  override def getWorkingDirectory: Path =
    back(local.getWorkingDirectory)
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(loc(f), permission)
  override def getFileStatus(f: Path): FileStatus =
    reStat(local.getFileStatus(loc(f)))
}

object CheckThenActFs {
  /** One-shot hook run INSIDE create(overwrite=false)'s check→put
    * window — the deterministic way to land a rival commit exactly
    * where the non-atomicity bites. */
  val betweenCheckAndPut =
    new java.util.concurrent.atomic.AtomicReference[Runnable](null)
}
