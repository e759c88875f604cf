package graft.plans

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The plan-audit artifact must cover the whole inventory: a query
  * added without regenerating PLANS.md (run `graft.Plans`) fails here,
  * so nothing silently skips the per-round plan review. */
class PlansCoverageSpec extends AnyFunSuite {

  test("PLANS.md has a dumped plan for every query in the inventory") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run graft.Plans")
    val text = Files.readString(path)
    val sections =
      "(?m)^## (\\S+)".r.findAllMatchIn(text).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- sections
    assert(missing.isEmpty,
      s"queries missing a dumped plan (rerun graft.Plans): $missing")
    assert(!text.contains("\nERROR: "), "a plan dump errored")
  }
}
