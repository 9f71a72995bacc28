package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("Nums: decimal aggregation is exact where double sums drift") {
    // 0.1 is inexact in binary; summing it 1000 times in double drifts,
    // in DECIMAL it is exactly 100.0.
    val df = Seq.fill(1000)(0.1).toDF("x")
    val got = df.agg(Nums.dsum(Nums.decp(col("x")))).head.getDouble(0)
    assert(got === 100.0)
  }

  test("Text.toks drops empties") {
    val r = Seq("a  b", "", "  ", "c").toDF("t")
      .select(Text.toks(col("t")).as("tk")).collect()
    assert(r(0).getSeq[String](0) === Seq("a", "b"))
    assert(r(1).getSeq[String](0) === Seq())
    assert(r(2).getSeq[String](0) === Seq())
    assert(r(3).getSeq[String](0) === Seq("c"))
  }

  test("Text.wordShingles: sliding k-grams, whole-doc for short texts") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(Text.wordShingles(Text.toks(col("t")), 3).as("sh")).collect()
    assert(r(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0) === Seq("a b"))
  }

  test("native WordShingles equals the HOF formulation on the corpus") {
    val docs = graft.sources.Tables.documents(spark, SharedSpark.sf)
    for (k <- Seq(1, 2, 3, 7)) {
      val diff = docs.select(
        Text.wordShingles(Text.toks(col("text")), k).as("a"),
        Text.wordShinglesHof(Text.toks(col("text")), k).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff === 0, s"k=$k: native and HOF shingles disagree")
    }
    // edge: empty token array yields [""] in both forms
    val e = Seq("").toDF("t").select(
      Text.wordShingles(Text.toks(col("t")), 3).as("a"),
      Text.wordShinglesHof(Text.toks(col("t")), 3).as("b")).head
    assert(e.getSeq[String](0) === Seq(""))
    assert(e.getSeq[String](0) === e.getSeq[String](1))
  }

  test("Text.charShingles slides over characters") {
    val r = Seq("abcde").toDF("t")
      .select(Text.charShingles(col("t"), 4).as("sh")).head
    assert(r.getSeq[String](0) === Seq("abcd", "bcde"))
  }

  test("Text.minhash is deterministic with k independent mins") {
    val df = Seq(Seq("x", "y", "z")).toDF("sh")
    val a = df.select(Text.minhash(col("sh"), 4)).head.getSeq[String](0)
    val b = df.select(Text.minhash(col("sh"), 4)).head.getSeq[String](0)
    assert(a === b)
    assert(a.size === 4)
    assert(a.distinct.size > 1) // salts give different permutations
  }

  test("Vectors.quantize floors exactly, including negatives") {
    val r = Seq((Seq(1.0f, -1.5f, 0.25f))).toDF("v")
      .select(Vectors.quantize(col("v"))).head.getSeq[Long](0)
    assert(r === Seq(1048576L, -1572864L, 262144L))
  }

  test("LongDot matches the interpreted fold bit-for-bit") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 1048576L), Seq(1048576L, -3L))).toDF("a", "b")
    val native = df.select(Vectors.dotQ(col("a"), col("b"))).collect()
    val folded = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)).collect()
    assert(native.map(_.getLong(0)).toSeq === folded.map(_.getLong(0)).toSeq)
    assert(native.head.getLong(0) === 32L)
  }

  test("LongDot is null-safe") {
    val r = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b").select(Vectors.dotQ(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("LongDot null-propagates like its HOF twin on ragged/null input") {
    // length mismatch -> NULL (zip_with pads with null, + propagates)
    val ragged = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L)))
      .toDF("a", "b")
    assert(ragged.select(Vectors.dotQ(col("a"), col("b"))).head.isNullAt(0))
    assert(ragged.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)).head.isNullAt(0))

    // null element -> NULL, both engines of computation
    val holed = Seq((Seq(Option(1L), None, Option(3L)),
      Seq(Option(4L), Option(5L), Option(6L)))).toDF("a", "b")
    assert(holed.select(Vectors.dotQ(col("a"), col("b"))).head.isNullAt(0))
    assert(holed.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)).head.isNullAt(0))

    // non-null early elements before the hole do not mask the null
    val tail = Seq((Seq(Option(1L), Option(2L), None),
      Seq(Option(4L), Option(5L), Option(6L)))).toDF("a", "b")
    assert(tail.select(Vectors.dotQ(col("a"), col("b"))).head.isNullAt(0))
  }

  test("HexParityBits packs exactly the ascii(substr)%2 parities") {
    val df = Seq("spark", "graft", "x").toDF("t")
      .select(md5(col("t")).as("h1"),
        md5(concat(lit("#:"), col("t"))).as("h2"))
    val packed = df.select(
      call_function(graft.plans.HexParityBits.FnName, col("h1"), col("h2")))
      .collect().map(_.getLong(0))
    val unpacked = df.select(
      (0 until 48).map { j =>
        val c = if (j < 32) substring(col("h1"), j + 1, 1)
                else substring(col("h2"), j - 31, 1)
        ((ascii(c) % 2) * lit(1L << j)).as(s"p$j")
      }.reduce(_ + _).as("packed"))
      .collect().map(_.getLong(0))
    assert(packed.toSeq === unpacked.toSeq)
  }
}
