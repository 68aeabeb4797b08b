package graft

import graft.expressions.{CosineSimilarity, DistinctShingles, Int8DotProduct, LangIdNative, MinHashSignature, QualityScoreNative, RepetitionStats, RollingChunks, SimHash64, SpanChunks, TokenStats}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions registering the engine's native expressions with the
  * SQL function registry (`spark.sql.extensions=graft.GraftExtensions`), so
  * `SELECT cosine_sim(a, b)` etc. work from SQL as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rules: every session gets the rank-1-window → min_by/max_by
    // rewrite (runs in the fixed-point operator-optimization batch).
    ext.injectOptimizerRule(_ => graft.plans.RankOneWindowToAggregate)
    ext.injectOptimizerRule(_ => graft.plans.RollupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitToTopK)
    ext.injectOptimizerRule(_ => graft.plans.PruneTopKPerKeyChild)
    // Planner strategies: the per-key top-k logical operator plans as two
    // bounded-heap passes around a hash exchange.
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      CosineSimilarity.info,
      exprs => {
        require(exprs.length == 2, s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sqdist_long"),
      graft.expressions.SqDistLong.info,
      exprs => {
        require(exprs.length == 2, s"sqdist_long expects 2 arguments, got ${exprs.length}")
        graft.expressions.SqDistLong(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      exprs => {
        require(exprs.length == 3,
          s"minhash_signature(text, numHashes, shingleSize) expects 3 arguments, got ${exprs.length}")
        MinHashSignature(exprs.head,
          intArg(exprs(1), "minhash_signature"), intArg(exprs(2), "minhash_signature"))
      }))
    ext.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "distinct_shingles"),
      exprs => {
        require(exprs.length == 2,
          s"distinct_shingles(text, shingleSize) expects 2 arguments, got ${exprs.length}")
        DistinctShingles(exprs.head, intArg(exprs(1), "distinct_shingles"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => {
        require(exprs.length == 1, s"simhash64(text) expects 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdNative].getName, "lang_id"),
      exprs => {
        require(exprs.length == 1, s"lang_id(text) expects 1 argument, got ${exprs.length}")
        LangIdNative(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[QualityScoreNative].getName, "quality_score"),
      exprs => {
        require(exprs.length == 1, s"quality_score(text) expects 1 argument, got ${exprs.length}")
        QualityScoreNative(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      exprs => {
        require(exprs.length == 1, s"token_stats(text) expects 1 argument, got ${exprs.length}")
        TokenStats(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      exprs => {
        require(exprs.length == 1, s"repetition_stats(text) expects 1 argument, got ${exprs.length}")
        RepetitionStats(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("int8_dot"),
      Int8DotProduct.info,
      exprs => {
        require(exprs.length == 2, s"int8_dot expects 2 arguments, got ${exprs.length}")
        Int8DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_chunks"),
      new ExpressionInfo(classOf[RollingChunks].getName, "rolling_chunks"),
      exprs => {
        require(exprs.length == 4,
          s"rolling_chunks(text, window, boundaryBits, maxChunk) expects 4 arguments, got ${exprs.length}")
        RollingChunks(exprs.head, intArg(exprs(1), "rolling_chunks"),
          intArg(exprs(2), "rolling_chunks"), intArg(exprs(3), "rolling_chunks"))
      }))
    ext.injectFunction((
      FunctionIdentifier("span_chunks"),
      new ExpressionInfo(classOf[SpanChunks].getName, "span_chunks"),
      exprs => {
        require(exprs.length == 1, s"span_chunks(text) expects 1 argument, got ${exprs.length}")
        SpanChunks(exprs.head)
      }))
    // NearestCentroids / LongSetContains / BpeSegment are deliberately NOT
    // SQL-registered: their constructors take driver-built reference
    // objects (centroid matrices, sorted hash sets, merge lists) that no
    // literal SQL argument can express.
  }
}
