package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Curation operator laws: decontamination flags exactly the planted docs,
  * PII scrubbing is complete and idempotent, mix sampling is deterministic
  * and tracks its declared rates.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("contaminatedDocs flags exactly the planted docs beyond the organic baseline") {
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val clean = docs.filter(col("doc_id") % 50 =!= 0)
    // the generator reuses phrases across docs, so a handful of ORGANIC
    // 13-gram overlaps exist even before planting — measure the baseline
    // rather than assuming zero (it is real contamination by definition)
    val baseline = Curation.contaminatedDocs(clean, ev)
      .select("doc_id").as[Long].collect().toSet
    val targets = clean.select("doc_id").as[Long].collect()
      .filterNot(baseline).sorted.take(3).toSet
    val evText = ev.orderBy("doc_id").select("text").as[String].head()
    val planted = clean.withColumn("text",
      when(col("doc_id").isInCollection(targets), concat(col("text"), lit(" "), lit(evText)))
        .otherwise(col("text")))
    val flagged = Curation.contaminatedDocs(planted, ev)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged -- baseline === targets) // planted appear...
    assert(baseline.subsetOf(flagged))      // ...and the organic ones remain
  }

  test("contaminatedDocs: hashed keys == string keys (counts and ids)") {
    val ev = docs.filter(col("doc_id") % 50 === 0)
    val planted = docs.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(ev.select(col("doc_id").as("__e"), col("text").as("__t"))),
        col("__e") === col("doc_id") - (col("doc_id") % 50), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" [CONT] "), col("__t")))
          .otherwise(col("text")).as("text"))
    def m(hash: Boolean) = Curation.contaminatedDocs(planted, ev, hashKeys = hash)
      .as[(Long, Long)].collect().toMap
    assert(m(hash = true) === m(hash = false))
  }

  test("scrubPii redacts every planted email/phone and is idempotent") {
    val seeded = docs.limit(100).withColumn("text",
      concat(col("text"), lit(" reach me at jane.doe+spam@mail.example.org / 555-867-5309")))
    val once = Curation.scrubPii(seeded).cache()
    assert(once.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() === 0)
    assert(once.filter(col("text").rlike(Curation.EmailRe) ||
      col("text").rlike(Curation.PhoneRe)).count() === 0)
    assert(once.filter(!col("text").contains("[EMAIL]") ||
      !col("text").contains("[PHONE]")).count() === 0)
    // scrubbing scrubbed text changes nothing (and counts drop to zero)
    val twice = Curation.scrubPii(once.select("doc_id", "text"))
    assert(twice.filter(col("n_emails") =!= 0 || col("n_phones") =!= 0).count() === 0)
    assert(twice.select("doc_id", "text").exceptAll(once.select("doc_id", "text")).count() === 0)
  }

  test("stratifiedMix is deterministic, keeps all of rate-16 strata, tracks rates") {
    val all = Tables.documents(spark, sfDir)
    val rates = Map("en" -> 16, "de" -> 8, "fr" -> 4)
    val a = Curation.stratifiedMix(all, "lang", rates, default16 = 2)
    val b = Curation.stratifiedMix(all.repartition(7), "lang", rates, default16 = 2)
    val ids = a.select("doc_id").as[Long].collect().toSet
    assert(ids === b.select("doc_id").as[Long].collect().toSet) // layout-invariant
    val kept = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = all.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") === total("en")) // rate 16/16 keeps everything
    // rate-k strata keep ~k/16 (binomial; 3-sigma band)
    for ((lang, r) <- Seq("de" -> 8, "fr" -> 4)) {
      val p = r / 16.0
      val n = total(lang).toDouble
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(kept(lang) - n * p) <= 3 * sigma + 1,
        s"$lang kept ${kept(lang)} of $n at rate $p")
    }
  }
}
