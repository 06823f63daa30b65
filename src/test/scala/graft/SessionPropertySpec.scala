package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessions

/** Property tests (SURVEY.md §5.2): session invariants and row-order
  * insensitivity over seeded random event streams (plain scalacheck-style
  * generation via seeded Random — the scalatest/scalacheck bridge isn't on
  * the offline classpath).
  */
class SessionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomStream(seed: Long): List[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    List.fill(60)((1L + rnd.nextInt(4), rnd.nextInt(600).toLong,
      rnd.nextInt(20000) / 100.0))
  }

  test("corpus diff properties over random snapshot pairs") {
    import graft.operators.Curation
    for (seed <- 1L to 5L) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("a", "b", "c", "d")
      def text() = List.fill(3 + rnd.nextInt(3))(vocab(rnd.nextInt(4))).mkString(" ")
      val ids = (0L until 40L).toList
      val old = ids.filter(_ => rnd.nextBoolean()).map(i => (i, text()))
      val neu = ids.filter(_ => rnd.nextBoolean()).map(i => (i, text()))
      val oldDf = old.toDF("doc_id", "text"); val neuDf = neu.toDF("doc_id", "text")
      val got = Curation.corpusDiff(oldDf, neuDf).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // statuses partition the id union, each id exactly once
      assert(got.keySet == (old.map(_._1) ++ neu.map(_._1)).toSet)
      val oldM = old.toMap; val neuM = neu.toMap
      got.foreach { case (id, st) =>
        val want = (oldM.get(id), neuM.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
          case _ => fail(s"id $id in neither side")
        }
        assert(st == want, s"seed $seed id $id: got $st want $want")
      }
      // swapping snapshots flips added<->removed, keeps the rest
      val rev = Curation.corpusDiff(neuDf, oldDf).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      got.foreach { case (id, st) =>
        val flipped = st match {
          case "added" => "removed"; case "removed" => "added"; case s => s
        }
        assert(rev(id) == flipped, s"seed $seed id $id asymmetric")
      }
    }
  }

  test("session invariants hold for random streams; result is row-order-insensitive") {
    for (seed <- 1L to 5L) {
      val rows = randomStream(seed)
      locally {
        val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        def df(rs: List[(Long, Long, Double)]) = rs.map { case (u, off, v) =>
          (new java.sql.Timestamp(base + off * 1000), u, v)
        }.toDF("ts", "user_id", "value")

        val out = Sessions.sessionAgg(df(rows), lit("30 seconds"))
          .orderBy("user_id", "session_start").collect()

        // conservation: counts and sums add up per user
        val gotCounts = out.groupBy(_.getAs[Long]("user_id"))
          .view.mapValues(_.map(_.getAs[Long]("event_count")).sum).toMap
        val wantCounts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        assert(gotCounts == wantCounts)
        val gotSum = out.map(_.getAs[Double]("session_sum")).sum
        val wantSum = rows.map(_._3).sum
        assert(math.abs(gotSum - wantSum) < 1e-6)

        // separation: consecutive sessions of a user never touch
        out.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
          ss.sortBy(_.getAs[java.sql.Timestamp]("session_start").getTime)
            .sliding(2).foreach {
              case Array(a, b) =>
                assert(b.getAs[java.sql.Timestamp]("session_start").getTime >
                  a.getAs[java.sql.Timestamp]("session_end").getTime)
              case _ =>
            }
        }

        // row-order insensitivity
        val shuffled = Sessions.sessionAgg(
          df(new scala.util.Random(seed + 99).shuffle(rows)),
          lit("30 seconds")).orderBy("user_id", "session_start").collect()
        assert(out.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
      }
    }
  }
}
