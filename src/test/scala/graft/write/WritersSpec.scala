package graft.write

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The write-semantics laws from SURVEY.md §5: W3/W4 idempotency (run twice ≡
  * run once), latest-wins correctness under shuffled input order, upsert
  * key-disjointness. Property inputs are drawn with plain ScalaCheck Gen
  * (deterministic seeds) — scalatestplus isn't on the offline classpath.
  */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  private def rows(data: Seq[(Int, Int, String)]): DataFrame =
    data.toDF("key", "version", "payload")

  private val genRows: Gen[List[(Int, Int, String)]] =
    Gen.listOf(for {
      k <- Gen.choose(0, 20)
      v <- Gen.choose(0, 100)
      p <- Gen.alphaStr.map(_.take(8))
    } yield (k, v, p))

  private def samples(n: Int): Seq[List[(Int, Int, String)]] =
    (0 until n).flatMap(i => genRows.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("latestWins keeps exactly the max-version row per key") {
    val df = rows(Seq((1, 1, "old"), (1, 2, "new"), (2, 5, "only")))
    val out = Writers.latestWins(df, Seq("key"), Seq("version"))
      .as[(Int, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, 2, "new"), (2, 5, "only")))
  }

  test("latestWins is insensitive to input order (shuffled input law)") {
    for (data <- samples(8) if data.nonEmpty) {
      // tie-break on payload so ordering is total — the determinism
      // requirement documented on latestWins
      val a = Writers.latestWins(rows(data), Seq("key"), Seq("version", "payload"))
        .as[(Int, Int, String)].collect().toSet
      val b = Writers.latestWins(rows(new scala.util.Random(7).shuffle(data)),
        Seq("key"), Seq("version", "payload"))
        .as[(Int, Int, String)].collect().toSet
      assert(a === b)
      assert(a.groupBy(_._1).forall(_._2.size == 1)) // one row per key
    }
  }

  test("incrementalDedup run twice with same batch ≡ run once (idempotency)") {
    val base = rows(Seq((1, 1, "a"), (2, 1, "b")))
    val batch = rows(Seq((1, 2, "a2"), (3, 1, "c")))
    val once = Writers.incrementalDedup(base, batch, Seq("key"), Seq("version", "payload"))
    val twice = Writers.incrementalDedup(once, batch, Seq("key"), Seq("version", "payload"))
    assert(once.as[(Int, Int, String)].collect().toSet ===
      twice.as[(Int, Int, String)].collect().toSet)
  }

  test("upsert replaces matching keys and appends new ones; run twice ≡ once") {
    val base = rows(Seq((1, 1, "a"), (2, 1, "b")))
    val incoming = rows(Seq((2, 9, "b9"), (3, 1, "c")))
    val out = Writers.upsert(base, incoming, Seq("key"))
      .as[(Int, Int, String)].collect().toSet
    assert(out === Set((1, 1, "a"), (2, 9, "b9"), (3, 1, "c")))
    val again = Writers.upsert(Writers.upsert(base, incoming, Seq("key")), incoming, Seq("key"))
      .as[(Int, Int, String)].collect().toSet
    assert(again === out)
  }

  test("upsert: incoming rows survive verbatim, old rows with incoming keys don't") {
    for {
      (oldData, i) <- samples(6).zipWithIndex
      newData <- genRows.apply(Gen.Parameters.default, Seed(1000L + i))
    } {
      val out = Writers.upsert(rows(oldData), rows(newData), Seq("key"))
        .as[(Int, Int, String)].collect()
      val newKeys = newData.map(_._1).toSet
      assert(newData.toSet.subsetOf(out.toSet))
      assert(out.filterNot(newData.contains).forall(r => !newKeys.contains(r._1)))
    }
  }

  test("appendDistinct eliminates exact duplicates only") {
    val a = rows(Seq((1, 1, "x"), (1, 1, "x"), (2, 1, "y")))
    val b = rows(Seq((1, 1, "x"), (3, 1, "z")))
    val out = Writers.appendDistinct(a, b).as[(Int, Int, String)].collect().toSet
    assert(out === Set((1, 1, "x"), (2, 1, "y"), (3, 1, "z")))
  }

  test("withAudit appends a created_date timestamp column") {
    val out = Writers.withAudit(rows(Seq((1, 1, "a"))))
    assert(out.columns.contains("created_date"))
    assert(out.schema("created_date").dataType.typeName === "timestamp")
    assert(out.filter(col("created_date").isNull).count() === 0)
  }
}
