package graft

import java.nio.file.Files
import graft.streaming.VersionedState

/** Retention contract for the versioned-MV state dirs (st14): vacuum
  * keeps the last `keep` versions so a mid-stream reader that resolved
  * latestVersion still finds a complete snapshot, and the MV stops
  * growing one table copy per micro-batch. */
class VersionedStateSpec extends SparkSpec {
  import spark.implicits._

  private def mkState(versions: Range): java.nio.file.Path = {
    val dir = Files.createTempDirectory("vstate")
    versions.foreach { v =>
      Seq((1L, v.toLong)).toDF("user_id", "n")
        .write.mode("overwrite").parquet(dir.resolve(s"v$v").toString)
    }
    dir
  }

  test("vacuum keeps the last `keep` versions and deletes the rest") {
    val dir = mkState(0 to 5)
    val removed = VersionedState.vacuum(dir, current = 5, keep = 3)
    assert(removed == Seq(0L, 1L, 2L), removed)
    val left = Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]()
    left.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.sorted == Seq("v3", "v4", "v5"), names)
  }

  test("a reader's resolved version survives the next batch's vacuum") {
    val dir = mkState(0 to 4)
    // reader resolves the latest version at batch 4...
    val resolved = VersionedState.latestVersion(dir).get
    assert(resolved == 4L)
    // ...batch 5 writes v5 and vacuums with keep=3: v4 (the resolved
    // snapshot) must remain complete and queryable
    Seq((2L, 5L)).toDF("user_id", "n")
      .write.mode("overwrite").parquet(dir.resolve("v5").toString)
    VersionedState.vacuum(dir, current = 5, keep = 3)
    val rows = spark.read.parquet(dir.resolve(s"v$resolved").toString).count()
    assert(rows == 1L)
  }

  test("latestVersion ignores non-version entries and empty dirs") {
    val dir = Files.createTempDirectory("vstate")
    assert(VersionedState.latestVersion(dir).isEmpty)
    Files.createDirectories(dir.resolve("_temporary"))
    Files.createDirectories(dir.resolve("v7"))
    Files.createDirectories(dir.resolve("v12"))
    assert(VersionedState.latestVersion(dir).contains(12L))
  }

  test("readVersion serves a live snapshot and fails LOUD on a vacuumed " +
      "or never-written version") {
    val dir = mkState(0 to 5)
    VersionedState.vacuum(dir, current = 5, keep = 3)
    // live version reads back exactly what its writer wrote
    val got = VersionedState.readVersion(spark, dir, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L)), got)
    // vacuumed (v0) and never-written (v9) both throw with the
    // available versions and the retention dial named — a silent
    // latest-version fallback would be a wrong-answer generator
    for (bad <- Seq(0L, 9L)) {
      val e = intercept[IllegalArgumentException](
        VersionedState.readVersion(spark, dir, bad))
      assert(e.getMessage.contains("keep") &&
        e.getMessage.contains("[3, 4, 5]"), e.getMessage)
    }
  }

  test("vacuum refuses keep < 2 (v_{n-1} feeds the next merge)") {
    val dir = mkState(0 to 1)
    intercept[IllegalArgumentException] {
      VersionedState.vacuum(dir, current = 1, keep = 1)
    }
  }
}
