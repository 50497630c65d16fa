package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.IoProbe

/** Pins the shared IO probe's path resolution and failure contract —
  * the round-13 review found the (since-deleted) StreamScale copy
  * probing a junk directory named after the whole SPARK_LOCAL_DIRS
  * comma list; these rules are now regression-locked. */
class IoProbeSpec extends AnyFunSuite {

  test("SPARK_LOCAL_DIRS comma list: first non-empty trimmed entry wins") {
    assert(IoProbe.path(None, env = Some("/disk1/tmp,/disk2/tmp"))
      == "/disk1/tmp")
    assert(IoProbe.path(None, env = Some(" , /disk2/tmp ")) == "/disk2/tmp")
  }

  test("env wins over spark.local.dir; conf used when env absent") {
    assert(IoProbe.path(Some("/conf/dir"), env = Some("/env/dir"))
      == "/env/dir")
    assert(IoProbe.path(Some("/conf/a,/conf/b"), env = None) == "/conf/a")
  }

  test("all-empty sources fall back to java.io.tmpdir") {
    val tmp = System.getProperty("java.io.tmpdir")
    assert(IoProbe.path(None, env = None) == tmp)
    assert(IoProbe.path(Some(" , "), env = Some(",")) == tmp)
  }

  test("mbPerSec measures a writable dir and returns -1 on an impossible one") {
    val dir = graft.core.TempDirs.create("graft-ioprobe-spec")
    assert(IoProbe.mbPerSec(dir) > 0.0)
    // /dev/null is a file: mkdirs under it fails, probe must report -1
    // rather than throw (the probe is evidence, not a precondition).
    assert(IoProbe.mbPerSec("/dev/null/sub") == -1.0)
  }
}
