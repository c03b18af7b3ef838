package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The staging contract (ADVICE r5): reuse is gated on the completion
  * marker, never on directory existence — a partially-failed prior attempt
  * must be wiped and re-staged, and a completed one must not re-run.
  */
class StagingSpec extends AnyFunSuite {

  test("partial prior staging (dir without marker) is wiped and re-staged") {
    val dir = Files.createTempDirectory("graft_staging_spec").toString + "/stage"
    new File(dir).mkdirs()
    Files.write(Paths.get(dir, "stale.bin"), "stale".getBytes("UTF-8"))
    Staging.ensure(dir) { out =>
      assert(!new File(out, "stale.bin").exists(), "partial attempt must be wiped first")
      Files.write(Paths.get(out, "fresh.bin"), "fresh".getBytes("UTF-8"))
    }
    assert(!new File(dir, "stale.bin").exists())
    assert(new File(dir, "fresh.bin").exists())
    assert(new File(dir, Staging.Marker).exists())
  }

  test("completed staging is reused — the body does not re-run") {
    val dir = Files.createTempDirectory("graft_staging_spec").toString + "/stage"
    Staging.ensure(dir) { out =>
      Files.write(Paths.get(out, "a.bin"), "a".getBytes("UTF-8"))
    }
    var reran = false
    Staging.ensure(dir) { _ => reran = true }
    assert(!reran)
    assert(new File(dir, "a.bin").exists())
  }

  test("a failing staging body leaves no marker, so the next call retries") {
    val dir = Files.createTempDirectory("graft_staging_spec").toString + "/stage"
    intercept[RuntimeException] {
      Staging.ensure(dir) { out =>
        Files.write(Paths.get(out, "half.bin"), "half".getBytes("UTF-8"))
        throw new RuntimeException("simulated mid-stage failure")
      }
    }
    assert(!new File(dir, Staging.Marker).exists())
    Staging.ensure(dir) { out =>
      Files.write(Paths.get(out, "full.bin"), "full".getBytes("UTF-8"))
    }
    assert(!new File(dir, "half.bin").exists(), "retry must not see half-staged data")
    assert(new File(dir, "full.bin").exists())
  }
}
