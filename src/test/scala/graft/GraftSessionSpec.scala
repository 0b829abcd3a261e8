package graft

import org.scalatest.funsuite.AnyFunSuite

/** The env-driven session config (settings.py analog): env wins over
  * code defaults, unset env leaves the harness behavior untouched, and
  * a malformed value fails with a pointed message instead of a stack
  * from inside session construction.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("no env → code defaults, optional keys absent") {
    val (m, conf) = GraftSession.resolvedConfig("local[*]", 32, Map.empty)
    assert(m == "local[*]")
    assert(conf("spark.sql.shuffle.partitions") == "32")
    assert(conf("spark.sql.adaptive.enabled") == "true")
    assert(conf("spark.sql.session.timeZone") == "UTC")
    assert(!conf.contains("spark.sql.autoBroadcastJoinThreshold"))
    assert(!conf.contains("spark.sql.warehouse.dir"))
  }

  test("env overrides master, partitions, broadcast threshold, warehouse dir") {
    val env = Map(
      "GRAFT_MASTER" -> "spark://h:7077",
      "GRAFT_SHUFFLE_PARTITIONS" -> "96",
      "GRAFT_BROADCAST_THRESHOLD" -> "-1",
      "GRAFT_WAREHOUSE_DIR" -> "/mnt/wh",
      "UNRELATED" -> "ignored")
    val (m, conf) = GraftSession.resolvedConfig("local[*]", 32, env)
    assert(m == "spark://h:7077")
    assert(conf("spark.sql.shuffle.partitions") == "96")
    assert(conf("spark.sql.autoBroadcastJoinThreshold") == "-1")
    assert(conf("spark.sql.warehouse.dir") == "/mnt/wh")
  }

  test("malformed shuffle partition count fails loudly") {
    val bad = Seq("zero" -> "0", "negative" -> "-4", "word" -> "many")
    bad.foreach { case (label, v) =>
      val e = intercept[IllegalArgumentException] {
        GraftSession.resolvedConfig("local[*]", 32,
          Map("GRAFT_SHUFFLE_PARTITIONS" -> v))
      }
      assert(e.getMessage.contains("GRAFT_SHUFFLE_PARTITIONS"), label)
    }
  }
}
