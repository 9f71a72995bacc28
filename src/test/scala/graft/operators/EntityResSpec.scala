package graft.operators

import graft.SharedSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Entity-resolution invariants: the blocked match equals its
  * definition (all same-block pairs within the edit-distance bound,
  * checked against an independent plain-Scala Levenshtein), and the
  * canonical assignment equals a naive union-find over the match
  * graph. Blocking recall is a declared tradeoff: cross-block pairs
  * are out of contract by design, not by bug.
  */
class EntityResSpec extends AnyFunSuite {
  import SharedSpark._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def names: Array[String] =
    Tables.part(spark, sf).select(col("p_name")).distinct()
      .collect().map(_.getString(0))

  test("er_blocking_match equals the naive same-block pair definition") {
    val out = EntityRes.erBlockingMatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val ns = names
    val expected = for {
      a <- ns; b <- ns
      if a < b && a.split(" ")(0) == b.split(" ")(0)
      d = lev(a, b) if d <= EntityRes.MaxDist
    } yield (a, b, d)
    assert(out.toSet === expected.toSet)
    assert(out.nonEmpty, "calibrated threshold should admit matches")
    out.foreach { case (a, b, d) => assert(d === lev(a, b)) }
  }

  test("er_canonical_entity equals naive union-find over the match graph") {
    val rows = EntityRes.erCanonicalEntity(spark, sf).collect()
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    names.foreach(n => parent(n) = n)
    EntityRes.erBlockingMatch(spark, sf).collect().foreach { r =>
      val (ra, rb) = (find(r.getString(0)), find(r.getString(1)))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    // canonical = min member of the component
    val members = names.groupBy(find)
    val canon = members.toSeq.flatMap { case (_, ms) =>
      val m = ms.min; ms.toSeq.map(_ -> m)
    }.toMap
    rows.foreach { r =>
      assert(r.getString(1) === canon(r.getString(0)),
        s"wrong canonical for ${r.getString(0)}")
      assert(r.getBoolean(2) === (r.getString(0) == r.getString(1)))
    }
    // listing counts conserve the table row count
    assert(rows.map(_.getLong(3)).sum === Tables.part(spark, sf).count())
  }
}
