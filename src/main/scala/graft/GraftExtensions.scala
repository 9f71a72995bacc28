package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-deployment entry point: register graft's native expressions
  * through the standard extensions mechanism —
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * — so EVERY session on the cluster (JDBC gateways, notebooks, jobs)
  * gets `graft_long_dot`, `graft_word_shingles`, `graft_hex_parity`
  * and `graft_topk_sketch` without calling `Graft.tune` first.
  * `Graft.tune` remains the per-session (temp-function) route for
  * environments where the session is built by someone else.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier(plans.LongDot.FnName),
      info(plans.LongDot.FnName,
        "_FUNC_(a, b) - exact integer dot product of two array<bigint>"),
      (exprs: Seq[Expression]) => plans.LongDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.WordShingles.FnName),
      info(plans.WordShingles.FnName,
        "_FUNC_(tokens, k) - sliding word k-grams joined by spaces"),
      (exprs: Seq[Expression]) => plans.WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier(plans.CharShingles.FnName),
      info(plans.CharShingles.FnName,
        "_FUNC_(s, n) - sliding character n-grams"),
      (exprs: Seq[Expression]) => plans.CharShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier(plans.HexParityBits.FnName),
      info(plans.HexParityBits.FnName,
        "_FUNC_(h1, h2) - 48 hex-char parities packed into a bigint"),
      (exprs: Seq[Expression]) => plans.HexParityBits(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.SpaceSavingTopK.FnName),
      info(plans.SpaceSavingTopK.FnName,
        "_FUNC_(col, k, capacity) - SpaceSaving heavy-hitters sketch"),
      (exprs: Seq[Expression]) => plans.SpaceSavingTopK(exprs(0),
        k = exprs(1).eval().asInstanceOf[Int],
        capacity = exprs(2).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.HllSketch.SketchFn),
      info(plans.HllSketch.SketchFn,
        "_FUNC_(col, p) - HyperLogLog sketch with 2^p registers"),
      (exprs: Seq[Expression]) => plans.HllSketchAgg(exprs(0),
        p = exprs(1).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.HllSketch.MergeFn),
      info(plans.HllSketch.MergeFn,
        "_FUNC_(sketch) - merge HLL sketches (register max)"),
      (exprs: Seq[Expression]) =>
        plans.HllMergeAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.HllSketch.EstFn),
      info(plans.HllSketch.EstFn,
        "_FUNC_(sketch) - cardinality estimate from an HLL sketch"),
      (exprs: Seq[Expression]) => plans.HllEstimate(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier(plans.HllSketch.UnionFn),
      info(plans.HllSketch.UnionFn,
        "_FUNC_(a, b) - union (register max) of two HLL sketches"),
      (exprs: Seq[Expression]) => plans.HllUnion(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.CmsSketch.SketchFn),
      info(plans.CmsSketch.SketchFn,
        "_FUNC_(col) - Count-Min frequency sketch (4x512 counters)"),
      (exprs: Seq[Expression]) =>
        plans.CmsSketchAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.CmsSketch.MergeFn),
      info(plans.CmsSketch.MergeFn,
        "_FUNC_(sketch) - merge CMS sketches (counter addition)"),
      (exprs: Seq[Expression]) =>
        plans.CmsMergeAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.CmsSketch.EstFn),
      info(plans.CmsSketch.EstFn,
        "_FUNC_(sketch, key) - upper-bound frequency of key"),
      (exprs: Seq[Expression]) => plans.CmsEstimate(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.CmsSketch.DotFn),
      info(plans.CmsSketch.DotFn,
        "_FUNC_(a, b) - join-size estimate (sketch inner product)"),
      (exprs: Seq[Expression]) => plans.CmsInnerProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.DdSketch.SketchFn),
      info(plans.DdSketch.SketchFn,
        "_FUNC_(x) - DDSketch quantile histogram (1% relative error)"),
      (exprs: Seq[Expression]) =>
        plans.DdSketchAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.DdSketch.MergeFn),
      info(plans.DdSketch.MergeFn,
        "_FUNC_(sketch) - merge DDSketches (bucket addition)"),
      (exprs: Seq[Expression]) =>
        plans.DdMergeAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.DdSketch.QuantileFn),
      info(plans.DdSketch.QuantileFn,
        "_FUNC_(sketch, q) - quantile estimate from a DDSketch"),
      (exprs: Seq[Expression]) => plans.DdQuantile(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.BloomFilter.AggFn),
      info(plans.BloomFilter.AggFn,
        "_FUNC_(key, log2bits) - bloom filter over a key set"),
      (exprs: Seq[Expression]) => plans.BloomAgg(exprs(0),
        if (exprs.length > 1) exprs(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(20))
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.BloomFilter.MergeFn),
      info(plans.BloomFilter.MergeFn,
        "_FUNC_(bf) - union bloom filters (bitwise OR)"),
      (exprs: Seq[Expression]) =>
        plans.BloomMergeAgg(exprs(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier(plans.BloomFilter.ContainsFn),
      info(plans.BloomFilter.ContainsFn,
        "_FUNC_(bf, key) - membership probe (no false negatives)"),
      (exprs: Seq[Expression]) => plans.BloomContains(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(plans.DeflateLen.FnName),
      info(plans.DeflateLen.FnName,
        "_FUNC_(text) - DEFLATE-compressed byte length (quality signal)"),
      (exprs: Seq[Expression]) => plans.DeflateLenExpr(exprs(0))))
  }
}
