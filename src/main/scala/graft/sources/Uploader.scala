package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** K6 — the publication-upload contract behind a trait. The reference
  * uploads finished CSV files to a remote resource store with
  * delete-then-add semantics per file and a delete-all + set-public
  * resource lifecycle (reference: src/Utilities/HydroShareUtility.py:
  * UploadFiles :420-446 — delete the remote file, tolerate not-found,
  * then add; deleteFilesInResource :460-472; setResourcesAsPublic
  * :448-458). The network client is driver-side HTTP over finished
  * files — not a Spark op — so the ENGINE contract is this trait; a
  * production impl wraps the REST client, and [[LocalDirUploader]] is
  * the hermetic filesystem implementation the pipeline tests run
  * against (this container has no egress).
  */
trait ResourceUploader {
  def listFiles(resourceId: String): Seq[String]
  /** Delete one file; MUST be a no-op if absent (the reference
    * swallows not-found, HydroShareUtility.py:426-428). */
  def deleteFile(resourceId: String, name: String): Unit
  def addFile(resourceId: String, localPath: String): Unit
  def setPublic(resourceId: String): Unit

  /** The reference's UploadFiles: delete-then-add each file, so a
    * re-publication replaces rather than duplicates.
    */
  final def uploadFiles(resourceId: String, localPaths: Seq[String]): Unit =
    localPaths.foreach { p =>
      deleteFile(resourceId, Paths.get(p).getFileName.toString)
      addFile(resourceId, p)
    }

  /** The reference's deleteFilesInResource: clear the resource. */
  final def deleteAllFiles(resourceId: String): Unit =
    listFiles(resourceId).foreach(deleteFile(resourceId, _))
}

/** Local-filesystem fake: a resource is a directory under `root`.
  * Faithful to the remote contract (flat file namespace per resource,
  * idempotent delete, replace-on-upload, public flag as a marker).
  */
final class LocalDirUploader(root: String) extends ResourceUploader {
  private def dir(resourceId: String): Path = {
    val d = Paths.get(root, resourceId)
    Files.createDirectories(d)
    d
  }

  def listFiles(resourceId: String): Seq[String] = {
    // Files.list holds an open DirectoryStream — close it or leak an fd
    val s = Files.list(dir(resourceId))
    try s.iterator.asScala
      .filter(Files.isRegularFile(_))
      .map(_.getFileName.toString)
      .filterNot(_ == ".public")
      .toSeq.sorted
    finally s.close()
  }

  def deleteFile(resourceId: String, name: String): Unit =
    Files.deleteIfExists(dir(resourceId).resolve(name))

  def addFile(resourceId: String, localPath: String): Unit = {
    val src = Paths.get(localPath)
    Files.copy(src, dir(resourceId).resolve(src.getFileName.toString),
      StandardCopyOption.REPLACE_EXISTING)
  }

  def setPublic(resourceId: String): Unit =
    Files.writeString(dir(resourceId).resolve(".public"), "public\n")

  def isPublic(resourceId: String): Boolean =
    Files.exists(dir(resourceId).resolve(".public"))
}
