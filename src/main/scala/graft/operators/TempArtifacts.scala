package graft.operators

/** Temp directories for the query-lifecycle artifacts (d13, s11/s15/
  * s16, st10-st13): each invocation builds an index artifact and
  * RETURNS a lazy frame that reads from it, so the query body cannot
  * delete the directory — the artifact must outlive the builder. The
  * correct lifetime is the process (one bench/verify run), so every
  * such directory is created under one per-process root that a JVM
  * shutdown hook removes recursively; repeated invocations within a
  * run still get fresh directories, and nothing accumulates across
  * runs.
  */
object TempArtifacts {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files
      .createTempDirectory("graft-query-artifacts")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory &&
            !java.nio.file.Files.isSymbolicLink(f.toPath))
          Option(f.listFiles())
            .getOrElse(Array.empty[java.io.File]).foreach(rm)
        f.delete()
      }
      rm(r.toFile)
    }))
    r
  }

  /** A fresh directory under the self-cleaning per-process root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString
}
