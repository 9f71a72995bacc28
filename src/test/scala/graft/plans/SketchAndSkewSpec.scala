package graft.plans

import graft.SharedSpark
import graft.functions.Skew
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchAndSkewSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("SpaceSaving: overestimates bounded by err, exact when capacity suffices") {
    // stream with known counts, capacity 4 forces evictions
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(5)("d") ++ Seq.fill(3)("e") ++ (1 to 10).map(i => s"x$i"))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = data.toDF("t").repartition(3)
      .agg(expr("graft_topk_sketch(t, 3, 4)")).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty && est.size <= 3)
    est.foreach { case (term, cnt, err) =>
      val exact = truth.getOrElse(term, 0L)
      assert(cnt >= exact, s"$term: est $cnt < true $exact")
      assert(cnt - err <= exact, s"$term: lower bound ${cnt - err} > true $exact")
    }
    // the undisputed heavy hitter must survive any eviction sequence
    assert(est.map(_._1).contains("a"))

    // merge-truncation accounting (mergeable-summaries rule): the
    // largest dropped count becomes the floor, and later insertions
    // carry it in (cnt, err)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = SpaceSavingTopK(
      BoundReference(0, StringType, nullable = true), k = 3, capacity = 3)
    def fill(terms: String*) = {
      val b = agg.createAggregationBuffer()
      terms.foreach(t => agg.update(b, InternalRow(UTF8String.fromString(t))))
      b
    }
    val merged = agg.merge(
      fill("a", "a", "a", "b", "b", "c"), // a:3 b:2 c:1
      fill("d", "d", "e", "e", "f")) //       d:2 e:2 f:1
    // combined a3 b2 d2 e2 c1 f1 -> keep {a,b,d}, max dropped count = 2
    assert(merged.floor === 2L)
    // round-trips through serialization
    assert(agg.deserialize(agg.serialize(merged)).floor === 2L)
    // a fresh term now starts from the floor: err 2, cnt floor+1
    agg.update(merged, InternalRow(UTF8String.fromString("g")))
    val (gc, ge) = merged.m("g")
    assert(ge === 2L && gc === 3L)

    // with ample capacity the sketch is exact and matches top_tokens
    val sk = TextAnalysis.topTokensSketch(spark, sf).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("cnt")).toMap
    val exact = TextAnalysis.topTokens(spark, sf).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n")).toMap
    exact.toSeq.sortBy(-_._2).take(10).foreach { case (t, n) =>
      assert(sk.get(t).contains(n), s"sketch missed exact heavy hitter $t")
    }
  }

  test("saltedJoin and saltedCount equal their unsalted forms") {
    val big = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val small = big.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(3)))
    val plain = big.join(small, Seq("user_id"))
      .select("event_id", "user_id", "segment")
      .orderBy("event_id").collect()
    val salted = Skew.saltedJoin(big, small, "user_id", "event_id", 8)
      .select("event_id", "user_id", "segment")
      .orderBy("event_id").collect()
    assert(salted.toSeq === plain.toSeq)

    val plainCnt = big.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val saltedCnt = Skew.saltedCount(big, col("user_id"), col("event_id"), 8)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(saltedCnt === plainCnt)
  }
}
