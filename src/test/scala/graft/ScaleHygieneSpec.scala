package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale-hygiene guards. An explicit broadcast() hint forces
  * the broadcast at ANY size, overriding the planner's size-based choice —
  * acceptable only for relations bounded by construction (fixed dims,
  * stat folds, per-stratum tables, query batches). The TPC-H-style tables
  * that grow with scale factor must never be hinted: at the 100 TB target
  * customer/part/supplier are billions of rows, and the hint that is
  * harmless at bench scale becomes a driver OOM. The planner (AQE)
  * broadcasts them anyway at small scale, so the hint buys nothing.
  */
class ScaleHygieneSpec extends AnyFunSuite {

  private val growingTables =
    Seq("customer", "part", "supplier", "orders", "lineitem", "events",
      "documents", "embeddings")

  test("no explicit broadcast hint on scale-growing tables in the gallery") {
    val entryDir = Paths.get("src/main/scala/graft/entry")
    assert(Files.isDirectory(entryDir), s"missing $entryDir (cwd moved?)")
    val offenders = Files.list(entryDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = new String(Files.readAllBytes(p))
        growingTables.flatMap { tbl =>
          val pat = ("broadcast\\(\\s*t\\(s, dir, \"" + tbl + "\"").r
          pat.findAllIn(src).map(_ => s"${p.getFileName}: broadcast($tbl)")
        }
      }.toList
    assert(offenders.isEmpty,
      s"explicit broadcast() on scale-growing tables:\n  " +
        offenders.mkString("\n  "))
  }
}
