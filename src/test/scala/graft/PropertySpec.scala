package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Events, TextAnalysis}

/** Property-based checks over the frame-level operator seams: scalacheck
  * generators drive randomized inputs through the SAME code the
  * dir-based queries run, and a plain-Scala reference model adjudicates.
  * Complements the fixed differential specs: generators deliberately
  * concentrate mass on the edges those specs enumerate by hand (exact
  * hour boundaries, ties, duplicate payloads, empty frames).
  *
  * Cases are drawn with FIXED seeds (pureApply) — a failure names its
  * seed and replays bit-identically; no flaky-test surface.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val baseEpochUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L

  // offsets mix free millisecond positions with exact hour-boundary hits
  // (the bucket-edge cases e10's explode must cover losslessly)
  private val offsetGen: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 3L * 3600L * 1000L),              // free, millis
    Gen.choose(0L, 3L).map(_ * 3600L * 1000L),       // exact hour edge
    Gen.choose(0L, 3L).map(h => h * 3600L * 1000L + 1L) // 1 ms past it
  )

  private case class Ev(id: Long, user: Long, typ: String, ms: Long)

  private val eventsGen: Gen[List[Ev]] =
    Gen.choose(0, 50).flatMap { n =>
      Gen.listOfN(n,
        for {
          user <- Gen.choose(1L, 4L)
          typ <- Gen.oneOf("click", "purchase", "view")
          off <- offsetGen
        } yield (user, typ, off))
        .map(_.zipWithIndex.map { case ((u, t, o), i) => Ev(i.toLong, u, t, o) })
    }

  private def cases[T](gen: Gen[T], n: Int): Seq[(Long, T)] =
    (1L to n.toLong).map { seed =>
      seed -> gen.pureApply(Gen.Parameters.default, Seed(seed))
    }

  test("e10 interval join equals a plain-Scala reference on generated event sets") {
    import spark.implicits._
    cases(eventsGen, 12).foreach { case (seed, evs) =>
      val df = evs.map(e => (e.id, new Timestamp(baseEpochUs / 1000L + e.ms),
          e.user, e.typ, 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Events.clickAttributionFrame(df).collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Long]("n_clicks_1h"),
            Option(r.getAs[java.lang.Long]("last_gap_sec")).map(_.toLong)))
        .toMap
      val clicks = evs.filter(_.typ == "click")
      val wantMap = evs.filter(_.typ == "purchase").map { p =>
        val inWin = clicks.filter(c => c.user == p.user &&
          c.ms >= p.ms - 3600L * 1000L && c.ms <= p.ms)
        val pSec = math.floorDiv(baseEpochUs / 1000L + p.ms, 1000L)
        val gap = inWin
          .map(c => pSec - math.floorDiv(baseEpochUs / 1000L + c.ms, 1000L))
          .sorted.headOption
        p.id -> (inWin.size.toLong, gap)
      }.toMap
      assert(got === wantMap, s"seed $seed")
    }
  }

  test("as-of join equals a per-row reference; ties resolve by (ts, payload)") {
    import spark.implicits._
    // tiny ts range forces same-instant collisions — the tie-break edge
    val rowsGen = for {
      nl <- Gen.choose(0, 15)
      nr <- Gen.choose(0, 15)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L),
        Gen.choose(0, 9)))
    } yield (ls, rs)
    cases(rowsGen, 10).foreach { case (seed, (ls, rs)) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new Timestamp(baseEpochUs / 1000L + t * 1000L))
      }.toDF("id", "k", "ts")
      val right = rs.map { case (k, t, v) =>
        (k, new Timestamp(baseEpochUs / 1000L + t * 1000L), v)
      }.toDF("k", "ts", "v")
      val got = AsOf.asOfJoin(left, right, key = "k", ts = "ts", payload = Seq("v"))
        .select(col("id"),
          col("prior.ts").as("pts"), col("prior.v").as("pv"))
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (Option(r.getAs[Timestamp]("pts")).map(_.getTime),
            Option(r.getAs[java.lang.Integer]("pv")).map(_.toInt)))
        .toMap
      val want = ls.zipWithIndex.map { case ((k, lt), i) =>
        val elig = rs.filter { case (rk, rt, _) => rk == k && rt <= lt }
        val best = elig.sortBy { case (_, rt, v) => (rt, v) }.lastOption
        i.toLong -> (best.map { case (_, rt, _) => baseEpochUs / 1000L + rt * 1000L },
          best.map(_._3))
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("t12 two-phase packing equals the sequential pack on generated corpora") {
    import spark.implicits._
    // docs with 0..9 single-char tokens; zero-token docs and exact
    // budget-boundary landings are the edges the two-phase form must
    // not reorder
    val docsGen = Gen.choose(1, 60).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 9)).map(_.zipWithIndex.map {
        case (k, i) => (i.toLong, Seq.fill(k)("w").mkString(" "), "en", "web")
      })
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    cases(docsGen, 8).foreach { case (seed, docs) =>
      val budget = 7L
      val got = TextAnalysis.packSequencesFrame(
          docs.toDF("doc_id", "text", "lang", "source"), budget)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("tokens"), r.getAs[Long]("seq_id"),
            r.getAs[Long]("seq_offset"))).toMap
      // sequential reference: md5(doc_id) order, exclusive running sum
      var pre = 0L
      val want = docs.map { case (id, text, _, _) =>
        (id, text.split("\\s+").count(_.nonEmpty).toLong)
      }.sortBy { case (id, _) => (h(id), id) }.map { case (id, toks) =>
        val out = id -> (toks, pre / budget, pre % budget)
        pre += toks
        out
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("t15 split: identical texts always co-split on generated corpora") {
    import spark.implicits._
    // few distinct payloads over many docs → guaranteed exact dups
    val docsGen = Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 5)).map(_.zipWithIndex.map {
        case (payload, i) => (i.toLong, s"payload text $payload", "en", "web")
      })
    }
    cases(docsGen, 8).foreach { case (seed, docs) =>
      val df = docs.toDF("doc_id", "text", "lang", "source")
      val textById = docs.map(d => d._1 -> d._2).toMap
      val out = TextAnalysis.hashSplitFrame(df)
        .select("doc_id", "split").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split")))
      assert(out.length === docs.length, s"seed $seed: not total")
      out.groupBy(kv => textById(kv._1)).foreach { case (_, rows) =>
        assert(rows.map(_._2).distinct.size === 1,
          s"seed $seed: exact dups split apart: ${rows.toSeq}")
      }
      assert(out.map(_._2).toSet.subsetOf(Set("train", "validation", "test")),
        s"seed $seed")
    }
  }
}
