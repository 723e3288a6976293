package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the bucket-exploded equi-join must produce
  * exactly the pairs of the brute-force theta-join — across intervals
  * spanning many buckets, sub-bucket intervals, zero-length and inverted
  * intervals, overlapping windows, boundary-exact points (time == start,
  * time == end), and bucket widths far from the interval lengths.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pointInInterval equals brute-force theta-join on adversarial layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(40317)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(3)
      val pts = (0 until 40 + rnd.nextInt(80)).map { i =>
        (s"k${rnd.nextInt(nKeys + 1)}", rnd.nextInt(200000).toLong, i.toLong)
      }
      val ivs = (0 until 10 + rnd.nextInt(25)).map { j =>
        val s = rnd.nextInt(200000).toLong
        val len = rnd.nextInt(4) match {
          case 0 => 0L                        // empty
          case 1 => -100L                     // inverted
          case 2 => rnd.nextInt(300).toLong   // sub-bucket
          case _ => rnd.nextInt(30000).toLong // many buckets
        }
        (s"k${rnd.nextInt(nKeys)}", s, s + len, j.toLong)
      }
      // force boundary-exact matches: a point at a start and at an end
      val ptsAll = pts ++ ivs.take(2).flatMap(iv => Seq(
        (iv._1, iv._2, 9000L + iv._4), (iv._1, iv._3, 9100L + iv._4)))
      val points = ptsAll.toDF("k", "time", "pid").repartition(1 + rnd.nextInt(5))
      val intervals = ivs.toDF("k", "s", "e", "iid").repartition(1 + rnd.nextInt(5))

      val bucket = Seq(60L, 1800L, 7200L, 100000L)(rnd.nextInt(4))
      val got = RangeJoin.pointInInterval(points, intervals,
          keys = Seq("k"), timeCol = "time", startCol = "s", endCol = "e",
          bucket = bucket)
        .select("pid", "iid").orderBy("pid", "iid").collect().toSeq.map(_.toSeq)
      val want = points.as("p").join(intervals.as("i"),
          col("p.k") === col("i.k") && col("p.time") >= col("i.s") && col("p.time") < col("i.e"))
        .select("pid", "iid").orderBy("pid", "iid").collect().toSeq.map(_.toSeq)
      assert(got == want, s"round $round (bucket=$bucket)")
    }
  }
}
