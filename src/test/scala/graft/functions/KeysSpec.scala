package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Keys.denseIds must equal ROW_NUMBER() OVER (PARTITION BY group
  * ORDER BY value) for any input — these pin the edges the oracle
  * queries don't reach (empty, single row, many buckets, cross-bucket
  * boundaries, grouped restart).
  */
class KeysSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("empty input yields empty output") {
    val out = Keys.denseIds(Seq.empty[String].toDF("v"), Nil, Seq("v"), "id")
    assert(out.count() === 0)
    assert(out.columns.contains("id"))
  }

  test("single row gets id 1") {
    val out = Keys.denseIds(Seq("only").toDF("v"), Nil, Seq("v"), "id")
      .collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("only", 1)))
  }

  test("ids are the global sorted rank across bucket boundaries") {
    // 100 values over 32 range buckets: every bucket boundary is an
    // opportunity for an off-by-one in the offset arithmetic
    val vals = (0 until 100).map(i => f"v$i%03d")
    val shuffled = new scala.util.Random(7).shuffle(vals)
    val out = Keys.denseIds(shuffled.toDF("v"), Nil, Seq("v"), "id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(out(v) === i + 1, s"value $v")
    }
  }

  test("ids restart at 1 per group") {
    val df = Seq(("g1", "b"), ("g1", "a"), ("g2", "z"), ("g2", "a"),
      ("g3", "m")).toDF("g", "v")
    val out = Keys.denseIds(df, Seq("g"), Seq("v"), "id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    assert(out === Map(("g1", "a") -> 1, ("g1", "b") -> 2,
      ("g2", "a") -> 1, ("g2", "z") -> 2, ("g3", "m") -> 1))
  }

  test("multi-column values order lexicographically") {
    val df = Seq(("b", 1), ("a", 2), ("a", 1)).toDF("x", "y")
    val out = Keys.denseIds(df, Nil, Seq("x", "y"), "id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(out === Map(("a", 1) -> 1, ("a", 2) -> 2, ("b", 1) -> 3))
  }

  test("fewer buckets than rows still ranks correctly") {
    val out = Keys.denseIds((1 to 10).map(i => f"k$i%02d").toDF("v"),
      Nil, Seq("v"), "id", buckets = 2)
      .agg(min(col("id")), max(col("id")), count(lit(1))).head
    assert((out.getInt(0), out.getInt(1), out.getLong(2)) === ((1, 10, 10L)))
  }
}
