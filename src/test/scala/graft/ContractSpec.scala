package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — local, small, UTC. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

/** Driver-contract invariants: every query runs, returns rows, and every
  * oracle entry points at a declared query.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and are non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("query column names are distinct (driver sorts by name)") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, TestSpark.sf).columns
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
    }
  }

  test("SURVEY §2 inventory and the query surface stay in sync") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val classicIds = "\\[x\\] ([qdtes]\\d\\d_\\w+|r_sql_parity)".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val componentIds = "\\[x\\] ((?:stream|multimodal)\\w*)".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val codeIds = SparkEntry.queries.keySet
    val codeClassic = codeIds.filterNot(id =>
      id.startsWith("stream") || id.startsWith("multimodal"))
    assert(classicIds == codeClassic,
      s"survey-only: ${classicIds -- codeClassic}; code-only: ${codeClassic -- classicIds}")
    // the streaming/multimodal component rows: every driver-checked
    // wrapper must be a §2 row (the reverse direction — every §2
    // component row carrying a CORRECTNESS entry — is the round-13
    // conversion this registry implements)
    val codeComponents = codeIds -- codeClassic
    assert(codeComponents.subsetOf(componentIds),
      s"component queries missing from SURVEY §2: ${codeComponents -- componentIds}")
  }
}
