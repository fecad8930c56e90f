package graft

/** Dev tool: measure driver-side Hadoop filesystem metadata costs on
  * this deployment — specifically `fs.listFiles(dir, recursive=true)`
  * (which materializes `LocatedFileStatus`es; on the local adapter
  * without the native Hadoop lib, reading permission/owner for each
  * one forks an `ls` process PER FILE) against a plain `listStatus`
  * recursion (path+length only, fork-free). The manifest layer's
  * per-batch listings ride whichever call this probe proves cheap.
  *
  * Run: `sbt "runMain graft.FsProbe /tmp/some-dir"`
  */
object FsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse {
      // synthesize a 64-file tree under the JVM tmp dir
      val d = java.nio.file.Files.createTempDirectory("fsprobe")
      for (i <- 0 until 8) {
        val sub = d.resolve(s"part=$i")
        java.nio.file.Files.createDirectory(sub)
        for (j <- 0 until 8)
          java.nio.file.Files.write(sub.resolve(s"f$j.parquet"),
            Array.fill[Byte](128)(1))
      }
      d.toString
    }
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }
    for (round <- 1 to 3) {
      println(s"-- round $round over $dir")
      val n1 = timed("listFiles(recursive)") {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) { val f = it.next(); n += 1; f.getLen }
        n
      }
      val n2 = timed("listStatus walk") {
        def walk(q: org.apache.hadoop.fs.Path): Int =
          fs.listStatus(q).map { st =>
            if (st.isDirectory) walk(st.getPath)
            else { st.getLen; 1 }
          }.sum
        walk(p)
      }
      println(s"   files: listFiles=$n1 listStatus=$n2")
    }
  }
}
