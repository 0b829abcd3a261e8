package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream.Event
import graft.streaming.SessionStream

class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream sessionization closes sessions on gap and emits on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = SessionStream.sessionize(src.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess").start()
    // session 1: two events 10 min apart; then a 2h gap → session 2
    src.addData(
      Event(1, ts("2024-01-01 10:00:00"), 42, "click", 1.0),
      Event(2, ts("2024-01-01 10:10:00"), 42, "click", 2.0))
    q.processAllAvailable()
    src.addData(Event(3, ts("2024-01-01 12:30:00"), 42, "view", 5.0))
    q.processAllAvailable()
    // push the watermark far ahead so the open session times out
    src.addData(Event(9, ts("2024-01-02 00:00:00"), 7, "click", 0.5))
    q.processAllAvailable()
    src.addData(Event(10, ts("2024-01-03 00:00:00"), 7, "click", 0.5))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"), r.getAs[Long]("duration_sec")))
    // user 42's first session: 2 events, 3.0 value, 600s
    assert(out.contains((42L, 2L, 3.0, 600L)))
    // user 42's second session eventually closed by the event-time timeout
    assert(out.contains((42L, 1L, 5.0, 0L)))
  }

  test("stream paths truncate at 3 steps and never cross a gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = SessionStream.sessionPaths(src.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("paths").start()
    // 4-event session (path truncates), 2h gap, then a 1-event session
    src.addData(
      Event(1, ts("2024-01-01 10:00:00"), 42, "signup", 0),
      Event(2, ts("2024-01-01 10:05:00"), 42, "click", 0),
      Event(3, ts("2024-01-01 10:10:00"), 42, "purchase", 0),
      Event(4, ts("2024-01-01 10:15:00"), 42, "view", 0))
    q.processAllAvailable()
    src.addData(Event(5, ts("2024-01-01 13:00:00"), 42, "view", 0))
    q.processAllAvailable()
    src.addData(Event(9, ts("2024-01-02 00:00:00"), 7, "click", 0))
    q.processAllAvailable()
    src.addData(Event(10, ts("2024-01-03 00:00:00"), 7, "click", 0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("paths").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("path"),
        r.getAs[Long]("n_events")))
    assert(out.contains((42L, "signup>click>purchase", 4L)))
    assert(out.contains((42L, "view", 1L)))
    assert(!out.exists(_._2.contains("view>view")), s"gap crossed: ${out.toSeq}")
  }

  test("stream path census == batch e09 census on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Events.sessionPaths(spark, TestSpark.sf).collect()
      .map { r =>
        val n = r.getAs[Long]("n_sessions")
        (r.getAs[String]("path"), n,
          math.round(r.getAs[Double]("avg_events") * n))
      }.toSet
    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val src = MemoryStream[Event]
    val q = SessionStream.sessionPaths(src.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("paths2").start()
    src.addData(events: _*)
    q.processAllAvailable()
    src.addData(Event(-1, ts("2100-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    src.addData(Event(-2, ts("2101-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("paths2").where("user_id >= 0").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_events")))
      .groupBy(_._1).map { case (p, rows) =>
        (p, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("continuous path census across triggers == batch e09 census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Events.sessionPaths(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"),
        r.getAs[Double]("avg_events"), r.getAs[Double]("pct_sessions"))).toSet
    // feed in 3 time-ordered chunks so triggers genuinely fold new
    // closed sessions into standing counts (no late-data drops: each
    // chunk's min ts >= the previous chunk's max ts)
    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val src = MemoryStream[Event]
    val q = SessionStream.pathCensus(SessionStream.sessionPaths(src.toDS()))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("census").start()
    events.grouped((events.length + 2) / 3).foreach { chunk =>
      src.addData(chunk: _*)
      q.processAllAvailable()
    }
    src.addData(Event(-1, ts("2100-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    src.addData(Event(-2, ts("2101-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val snap = spark.table("census").where("path <> 'flush'").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"),
        r.getAs[Double]("avg_events")))
    val total = snap.map(_._2).sum.toDouble
    // pct_sessions is the reader's one division over the snapshot
    val stream = snap.map { case (p, n, avg) => (p, n, avg, n.toDouble / total) }.toSet
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("path census supports update output mode (incremental emission)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = SessionStream.pathCensus(SessionStream.sessionPaths(src.toDS()))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("census_upd").start()
    src.addData(
      Event(1, ts("2024-01-01 10:00:00"), 42, "click", 0),
      Event(2, ts("2024-01-01 10:05:00"), 42, "view", 0))
    q.processAllAvailable()
    // closing flush: the session emits, the census row updates
    src.addData(Event(9, ts("2024-01-02 00:00:00"), 7, "click", 0))
    q.processAllAvailable()
    src.addData(Event(10, ts("2024-01-03 00:00:00"), 7, "click", 0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("census_upd").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions")))
    assert(rows.contains(("click>view", 1L)), s"got ${rows.toSeq}")
  }

  test("streaming sessions match the batch operator on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch result on sf0.001
    val batch = graft.operators.Events.sessionize(spark, TestSpark.sf)
      .selectExpr("user_id", "n_events", "round(total_value, 2) AS tv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // stream the same events through, then flush with a far-future event
    val events = graft.sources.Tables.events(spark, TestSpark.sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val src = MemoryStream[Event]
    val q = SessionStream.sessionize(src.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess2").start()
    src.addData(events: _*)
    q.processAllAvailable()
    src.addData(Event(-1, ts("2100-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    src.addData(Event(-2, ts("2101-01-01 00:00:00"), -1, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("sess2").where("user_id >= 0").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        BigDecimal(r.getAs[Double]("total_value")).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet
    assert(stream == batch, s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }
}
