package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** FileSinkDirs' two-generation retention (r14 advice): the drain's
  * read-back DataFrame is lazy, so the immediately preceding sink dir
  * must SURVIVE the next replace() of the same name (a held frame can
  * still re-trigger), and /tmp must stay bounded at 2× distinct query
  * names — the grandparent dir is the one reclaimed. */
class FileSinkDirsSpec extends AnyFunSuite {

  test("previous dir survives one replace; grandparent is reclaimed; names are independent") {
    val g1 = FileSinkDirs.replace("fsinkspec_a")
    assert(java.nio.file.Files.exists(g1))
    val g2 = FileSinkDirs.replace("fsinkspec_a")
    // two-generation retention: a frame lazily reading g1 still works
    assert(java.nio.file.Files.exists(g1), "previous dir must survive the next drain")
    assert(java.nio.file.Files.exists(g2))
    val other = FileSinkDirs.replace("fsinkspec_b")
    assert(java.nio.file.Files.exists(g1), "another name's drain must not reclaim it")
    val g3 = FileSinkDirs.replace("fsinkspec_a")
    // bounded: the two-runs-ago dir is gone, the parent is kept
    assert(!java.nio.file.Files.exists(g1), "grandparent dir must be reclaimed")
    assert(java.nio.file.Files.exists(g2))
    assert(java.nio.file.Files.exists(g3))
    assert(java.nio.file.Files.exists(other))
    // cleanup this spec's litter (the JVM-exit hook would too)
    Seq(g2, g3, other).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit)
  }
}
