package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class GraftConfigSpec extends AnyFunSuite {

  test("three-layer merge: fallbacks <- file <- overrides") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f, "session_gap_seconds=100\nwindow_duration=5 minutes\n")
    val cfg = GraftConfig.load(Some(f.toString),
      Map("session_gap_seconds" -> "200", "modules" -> "core, brightness"))
    assert(cfg.windowDuration === "5 minutes")      // from file
    assert(cfg.sessionGapSeconds === 200L)          // override beats file
    assert(cfg.modules === Seq("core", "brightness"))
    assert(cfg.useMergeExec)                        // fallback untouched
  }

  test("unknown keys rejected") {
    intercept[IllegalArgumentException](GraftConfig().withOverrides(Map("nope" -> "1")))
  }
}
