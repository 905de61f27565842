package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The contract scratch sweep must never reap a directory whose owning
  * JVM is still alive, however old the directory is (round-4 ADVICE: a
  * >24h soak run would otherwise have its lazily-read index deleted out
  * from under it), while still reclaiming dirs whose owner crashed
  * without running its exit hook. */
class ScratchSweepSpec extends AnyFunSuite {

  private def mkDir(root: java.io.File, name: String, pid: Option[String],
                    ageMs: Long): java.io.File = {
    val d = new java.io.File(root, name)
    assert(d.mkdirs())
    pid.foreach { p =>
      Files.write(new java.io.File(d, SparkEntry.PidFile).toPath,
        p.getBytes("UTF-8"))
    }
    assert(d.setLastModified(System.currentTimeMillis() - ageMs))
    d
  }

  test("sweep: dead-owner and unstamped old dirs reaped, live-owner and young dirs kept") {
    val root = Files.createTempDirectory("scratch-sweep-spec").toFile
    val old = 48L * 3600 * 1000
    val myPid = ProcessHandle.current().pid().toString
    // a pid that cannot be a live process (beyond pid_max on Linux)
    val deadPid = "999999999"
    val liveOld = mkDir(root, "live-old", Some(myPid), old)
    val deadOld = mkDir(root, "dead-old", Some(deadPid), old)
    val bareOld = mkDir(root, "bare-old", None, old) // pre-stamp layout
    val junkOld = mkDir(root, "junk-old", Some("not-a-pid"), old)
    val deadNew = mkDir(root, "dead-new", Some(deadPid), 0L)
    SparkEntry.sweepStale(root, System.currentTimeMillis() - 24L * 3600 * 1000)
    assert(liveOld.isDirectory, "live-owner dir must survive any age")
    assert(!deadOld.exists, "dead-owner old dir must be reaped")
    assert(!bareOld.exists, "unstamped old dir falls back to age: reaped")
    assert(!junkOld.exists, "unreadable stamp is not liveness: reaped")
    assert(deadNew.isDirectory, "young dir untouched regardless of owner")
    // cleanup
    SparkEntry.sweepStale(root, System.currentTimeMillis() + 1)
    assert(!deadNew.exists)
    assert(liveOld.isDirectory) // still ours, still alive
  }
}
