package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{Base64NoWrap, KrHash, KrHashF, MinHashSignature, SimHashBits, SimHashLong, WordShingles}
import graft.operators.Dedup

/** SparkSessionExtensions entry point: makes graft's custom Catalyst
  * expressions callable from SQL —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT base64_nowrap(CAST(text AS BINARY)) FROM docs")
  * }}}
  *
  * Registered: base64_nowrap, word_shingles(words, n),
  * minhash_signature(hashes) (engine-default 64 permutations),
  * simhash_bits(hashes), kr_hash, simhash_fp, nfc_normalize,
  * dot_product, char_entropy, and the mergeable aggregates
  * min_k_distinct(v, k), hll_sketch(v), hll_regs(v),
  * topk_frequent(v, k) (engine-default dictionary bound).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** Every builder validates arity up front: a mis-aritied SQL call
    * gets Spark's own WRONG_NUM_ARGS AnalysisException instead of a
    * bare NoSuchElementException out of `exprs(i)`. */
  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw CatalystBridge.wrongNumArgs(name, n, exprs.length)
    exprs
  }

  /** Foldable integral argument for builders that bake a parameter
    * (k, n) into the expression at plan time: a non-foldable argument
    * (`min_k_distinct(v, c)`) or a non-integral literal gets Spark's
    * own NON_FOLDABLE_ARGUMENT AnalysisException instead of a bare
    * ClassCastException/NPE out of `eval()`; an INT-ranged BIGINT
    * literal (`CAST(10 AS BIGINT)`) is accepted and narrowed. */
  private def intArg(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable) throw CatalystBridge.nonFoldableArg(fn, param)
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => throw CatalystBridge.nonFoldableArg(fn, param)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinNative.AsofStrategy)
    ext.injectFunction((
      FunctionIdentifier("base64_nowrap"),
      new ExpressionInfo(classOf[Base64NoWrap].getName, "base64_nowrap"),
      exprs => Base64NoWrap(arity("base64_nowrap", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      exprs => { arity("word_shingles", 2)(exprs)
        WordShingles(exprs.head, intArg("word_shingles", "n", exprs(1))) }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      exprs => MinHashSignature(arity("minhash_signature", 1)(exprs).head,
        Dedup.perms.map(_._1).toArray, Dedup.perms.map(_._2).toArray,
        2147483647L)))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      exprs => SimHashBits(arity("simhash_bits", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("kr_hash"),
      new ExpressionInfo(classOf[KrHash].getName, "kr_hash"),
      exprs => KrHash(arity("kr_hash", 1)(exprs).head, KrHashF.B, KrHashF.M)))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      exprs => graft.functions.NfcNormalize(
        arity("nfc_normalize", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashLong].getName, "simhash_fp"),
      exprs => SimHashLong(arity("simhash_fp", 1)(exprs).head,
        Dedup.SimHashBits)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
        "dot_product"),
      exprs => { arity("dot_product", 2)(exprs)
        graft.functions.DotProduct(exprs.head, exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[graft.functions.CharEntropy].getName,
        "char_entropy"),
      exprs => graft.functions.CharEntropy(
        arity("char_entropy", 1)(exprs).head)))
    // sketch AGGREGATES: the builder returns the AggregateFunction and
    // the analyzer wraps it in an AggregateExpression, exactly as for
    // the built-in aggregates — so SQL users get the same mergeable
    // bounded-state sketches the operators use
    ext.injectFunction((
      FunctionIdentifier("min_k_distinct"),
      new ExpressionInfo(classOf[graft.functions.MinKDistinct].getName,
        "min_k_distinct"),
      exprs => { arity("min_k_distinct", 2)(exprs)
        graft.functions.MinKDistinct(exprs.head,
          intArg("min_k_distinct", "k", exprs(1))) }))
    ext.injectFunction((
      FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[graft.functions.HllSketch].getName,
        "hll_sketch"),
      exprs => graft.functions.HllSketch(
        arity("hll_sketch", 1)(exprs).head)))
    ext.injectFunction((
      FunctionIdentifier("hll_regs"),
      new ExpressionInfo(classOf[graft.functions.HllSketch].getName,
        "hll_regs"),
      exprs => graft.functions.HllSketch(
        arity("hll_regs", 1)(exprs).head, regs = true)))
    ext.injectFunction((
      FunctionIdentifier("topk_frequent"),
      new ExpressionInfo(classOf[graft.functions.TopKFrequent].getName,
        "topk_frequent"),
      exprs => { arity("topk_frequent", 2)(exprs)
        graft.functions.TopKFrequent(exprs.head,
          intArg("topk_frequent", "k", exprs(1)), maxDict = 100000) }))
  }
}
