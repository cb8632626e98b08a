package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AtomicCache

/** Gates for the atomic cache-publish protocol (ADVICE r4): fresh
  * publish, no-op on a committed copy, loser-discard on a race, and —
  * the recovery case — eviction of a stale partial dir left by a
  * killed earlier run instead of silently serving it. */
class AtomicCacheSpec extends AnyFunSuite {

  private def freshTarget() = {
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_atomic_spec_${System.nanoTime()}")
    sys.addShutdownHook(AtomicCache.deleteRec(dir))
    dir
  }

  /** A writer that mimics Spark's committer: payload + _SUCCESS. */
  private def writer(payload: String)(staging: String): Unit = {
    val p = Paths.get(staging)
    Files.createDirectories(p)
    Files.writeString(p.resolve("data"), payload)
    Files.writeString(p.resolve("_SUCCESS"), "")
  }

  test("fresh publish lands content and the _SUCCESS marker") {
    val dir = freshTarget()
    AtomicCache.materialize(dir)(writer("v1"))
    assert(Files.readString(dir.resolve("data")) == "v1")
    assert(Files.exists(dir.resolve("_SUCCESS")))
  }

  test("a committed copy is served untouched; the writer never runs") {
    val dir = freshTarget()
    AtomicCache.materialize(dir)(writer("v1"))
    var ran = false
    AtomicCache.materialize(dir) { _ => ran = true }
    assert(!ran)
    assert(Files.readString(dir.resolve("data")) == "v1")
  }

  test("a stale partial (no _SUCCESS) is evicted and replaced, not served") {
    val dir = freshTarget()
    // simulate a killed run: partial dir squatting on the path
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("data"), "partial-garbage")
    AtomicCache.materialize(dir)(writer("v2"))
    assert(Files.readString(dir.resolve("data")) == "v2")
    assert(Files.exists(dir.resolve("_SUCCESS")))
  }

  test("a writer that throws leaves neither the target nor its staging dir") {
    val dir = freshTarget()
    val boom = intercept[RuntimeException] {
      AtomicCache.materialize(dir) { staging =>
        Files.createDirectories(Paths.get(staging))
        Files.writeString(Paths.get(staging).resolve("data"), "partial")
        throw new RuntimeException("writer died mid-staging")
      }
    }
    assert(boom.getMessage.contains("mid-staging"))
    assert(!Files.exists(dir))
    val leftovers = dir.getParent.toFile.listFiles
      .map(_.getName).filter(_.startsWith(dir.getFileName.toString))
    assert(leftovers.isEmpty, s"staging leaked: ${leftovers.toSeq}")
  }

  test("losing a publish race discards the staging copy and keeps the winner") {
    val dir = freshTarget()
    // the loser's writer publishes the winner's copy mid-write, before
    // its own move — the surviving content must be the committed one
    AtomicCache.materialize(dir) { staging =>
      writer("winner")(staging) // stage own (equivalent) copy …
      // … and a racer commits first:
      writer("winner")(dir.toString + "_race")
      Files.move(Paths.get(dir.toString + "_race"), dir,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    assert(Files.readString(dir.resolve("data")) == "winner")
    // no staging leftovers
    val parent = dir.getParent.toFile.listFiles
      .map(_.getName).filter(_.startsWith(dir.getFileName.toString + "_stg_"))
    assert(parent.isEmpty)
  }
}
