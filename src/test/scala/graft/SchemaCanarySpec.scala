package graft

import scala.util.{Failure, Success, Try}

/** Schema-drift canary (VERDICT r9 item #2).
  *
  * Round 9 lost a quarter of the query surface silently: the driver
  * regenerated testdata with `events.ts` as timestamp[us] (was
  * TIMESTAMP(NANOS)) and every events-family query failed analysis until the
  * loaders adapted. This canary makes that class of breakage loud and
  * attributable:
  *
  *  1. every table in `Tables.all` loads, and its per-column dtypes are
  *     printed into the failure message on any downstream break, so the
  *     drifted table+column+dtype is named directly;
  *  2. every entry in `SparkEntry.queries` passes ANALYSIS (plan resolution
  *     only — no jobs run, so the whole canary is seconds, not minutes).
  *
  * Analysis is exactly the phase that broke in r9 (DATATYPE_MISMATCH), and
  * it's the phase where schema drift surfaces: a column rename, a dtype
  * change, a dropped field all fail resolution before any task launches.
  */
class SchemaCanarySpec extends SparkSuite {

  private def schemaLine(t: String): String =
    Try(Tables.load(spark, sf, t).schema) match {
      case Success(sc) =>
        s"$t(${sc.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")})"
      case Failure(e) => s"$t(UNREADABLE: ${e.getMessage.linesIterator.next()})"
    }

  test("every table in Tables.all loads at sf0.001") {
    val bad = Tables.all.flatMap { t =>
      Try(Tables.load(spark, sf, t).schema).failed.toOption
        .map(e => s"$t: ${e.getMessage.linesIterator.next()}")
    }
    assert(bad.isEmpty, s"unreadable tables:\n${bad.mkString("\n")}")
  }

  test("every SparkEntry query analyzes against the current testdata schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        Try {
          // Force full analysis (resolution + type checks); nothing executes.
          q(spark, sf).queryExecution.analyzed
        } match {
          case Success(_) => None
          case Failure(e) =>
            Some(s"$name: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
        }
    }
    if (failures.nonEmpty) {
      val ctx = Tables.all.map(schemaLine).mkString("\n  ")
      fail(
        s"${failures.size}/${SparkEntry.queries.size} queries failed analysis — " +
          s"schema drift?\nCurrent table schemas:\n  $ctx\nFailures:\n" +
          failures.map("  " + _).mkString("\n"))
    }
  }
}
