package graft.expressions

import graft.SparkSpec
import graft.core.Tables
import graft.scale.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression == higher-order-function fold, bit-for-bit on real data") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .limit(2000)
    val diff = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact: same sequential fold
      .count()
    assert(diff === 0)
  }

  test("known values and edge cases") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal -> 0
      (Array(1.0, 2.0), Array(2.0, 4.0)),   // parallel -> 1
      (Array(1.0, 0.0), Array(-1.0, 0.0))   // opposite -> -1
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 9)).as[Double].collect()
    assert(got.toSeq === Seq(0.0, 1.0, -1.0))
  }

  test("null input yields null; zero vector yields NaN (documented)") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 2.0)))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0).isNaN)
  }

  test("cosine_sim is callable from SQL (GraftExtensions registration)") {
    Tables.embeddings(spark, sfDir).limit(5).createOrReplaceTempView("emb_cos")
    val got = spark.sql(
      """SELECT vec_id, cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
        |                          CAST(embedding AS ARRAY<DOUBLE>)) AS s
        |FROM emb_cos""".stripMargin).as[(Long, Double)].collect()
    assert(got.length === 5)
    assert(got.forall { case (_, s) => math.abs(s - 1.0) < 1e-9 })
  }

  test("minhash_signature / distinct_shingles / simhash64 callable from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t").createOrReplaceTempView("sql_exprs")
    val row = spark.sql(
      """SELECT size(minhash_signature(t, 16, 3)) AS sig_len,
        |       size(distinct_shingles(t, 3)) AS n_shingles,
        |       simhash64(t) AS sh
        |FROM sql_exprs""".stripMargin).head()
    assert(row.getInt(0) === 16)
    assert(row.getInt(1) === 7) // 9 tokens -> 7 trigram shingles, all distinct
    assert(row.getLong(2) !== 0L)
  }

  test("rolling_chunks / span_chunks callable from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t").createOrReplaceTempView("sql_chunk_exprs")
    val row = spark.sql(
      """SELECT size(rolling_chunks(t, 8, 4, 64)) AS n_cdc,
        |       aggregate(span_chunks(t), 0L, (a, c) -> a + c.n_tokens) AS n_tok
        |FROM sql_chunk_exprs""".stripMargin).head()
    assert(row.getInt(0) >= 1)
    assert(row.getLong(1) === 9L) // spans partition the 9-token stream
  }

  test("DistinctShingles matches the composable Text.shingles semantics") {
    import graft.scale.Text
    val df = Seq("a b c d e", "a b", "x").toDF("t")
    val native = df.select(org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DistinctShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(col("t")), 3)))
      .as[Seq[String]].collect()
    val composed = df.select(array_distinct(Text.shingles(col("t"), 3)))
      .as[Seq[String]].collect()
    assert(native.toSeq === composed.toSeq)
  }

  test("codegen path actually compiles (no fallback to interpreted)") {
    val emb = Tables.embeddings(spark, sfDir).limit(10)
    val df = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("s"))
    df.collect() // would throw on codegen compile errors (with fallback disabled)
    val wasCodegen = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    // force codegen-only evaluation to prove doGenCode is valid
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val s = df.as[Double].collect()
      assert(s.forall(v => math.abs(v - 1.0) < 1e-9))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", wasCodegen)
  }
}
