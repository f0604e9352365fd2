package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.3 is the normative operator inventory the round review
  * checks line by line; SparkEntry.queries is what actually runs. This
  * spec makes drift impossible: every declared `qNN_*` table row must
  * be registered, and every registered query must have its §2.3 row.
  * (No-oracle utility components — SkewJoin, ClusteredWrite, ZOrderWrite,
  * BucketedTables, SketchRollup, streaming — are declared as `— `-prefixed
  * rows without a qNN id and are covered by their own suites.) */
class SurveyDriftSpec extends AnyFunSuite {

  private val qid = """\| `(q\d+[a-z0-9_]*)`""".r

  test("SURVEY §2.3 rows and SparkEntry.queries are identical sets") {
    val lines = Files.readAllLines(Paths.get("SURVEY.md")).asScala
    val sec = lines
      .dropWhile(!_.startsWith("### 2.3"))
      .takeWhile(l => !l.startsWith("### 2.4"))
    val declared = sec.collect {
      case l if l.startsWith("| `q") =>
        qid.findFirstMatchIn(l).map(_.group(1))
    }.flatten.toSet
    val registered = SparkEntry.queries.keySet

    val unregistered = declared -- registered
    val undeclared = registered -- declared
    assert(unregistered.isEmpty,
      s"declared in SURVEY §2.3 but not registered: ${unregistered.toSeq.sorted}")
    assert(undeclared.isEmpty,
      s"registered but missing a SURVEY §2.3 row: ${undeclared.toSeq.sorted}")
    // (oracle-without-query orphans are DataContractSpec's invariant)
  }
}
