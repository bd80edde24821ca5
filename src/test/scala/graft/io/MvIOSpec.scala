package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Commit-marker recovery contract (no Spark needed): a missing or
  * torn marker demotes that version silently (the replay heals it),
  * but a WELL-FORMED marker this reader does not understand must fail
  * loudly — silently demoting it would roll the store back to an
  * older version on every read of a future-format store.
  */
class MvIOSpec extends AnyFunSuite {

  private def mkStore(): String = {
    val root = Files.createTempDirectory("graft-mvio").toString
    Files.writeString(Paths.get(s"$root/mv.json"),
      """{"format": 1, "keys": "k", "value": "v"}""")
    Files.createDirectories(Paths.get(s"$root/v0"))
    Files.writeString(Paths.get(s"$root/v0/commit.json"), """{"batch_id": -1}""")
    root
  }

  test("a torn (truncated, non-JSON) marker demotes the version; the older commit wins") {
    val root = mkStore()
    Files.createDirectories(Paths.get(s"$root/v1"))
    Files.writeString(Paths.get(s"$root/v1/commit.json"), """{"batch_""")
    assert(MvIO.latestCommitted(root) == (0, -1L))
  }

  test("an empty marker demotes the version; the older commit wins") {
    val root = mkStore()
    Files.createDirectories(Paths.get(s"$root/v1"))
    Files.writeString(Paths.get(s"$root/v1/commit.json"), "")
    assert(MvIO.latestCommitted(root) == (0, -1L))
  }

  test("a complete-JSON marker without batch_id fails loudly instead of rolling back") {
    val root = mkStore()
    Files.createDirectories(Paths.get(s"$root/v1"))
    Files.writeString(Paths.get(s"$root/v1/commit.json"),
      """{"epoch": 7, "writer": "future"}""")
    val ex = intercept[IllegalArgumentException] { MvIO.latestCommitted(root) }
    assert(ex.getMessage.contains("unrecognized marker format"), ex.getMessage)
  }

  test("a well-formed newer marker wins") {
    val root = mkStore()
    Files.createDirectories(Paths.get(s"$root/v1"))
    Files.writeString(Paths.get(s"$root/v1/commit.json"), """{"batch_id": 3}""")
    assert(MvIO.latestCommitted(root) == (1, 3L))
  }
}
