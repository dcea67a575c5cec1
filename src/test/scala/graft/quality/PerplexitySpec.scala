package graft.quality

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)

  test("buckets partition each language into ordered terciles") {
    val b = Perplexity.buckets(docs, "doc_id", "text", "lang", exact = true)
      .cache()
    assert(b.count() == docs.count())
    // per language: head scores strictly above tail scores
    val byLang = b.groupBy($"lang", $"bucket")
      .agg(min($"mean_logprob").as("lo"), max($"mean_logprob").as("hi"),
        count(lit(1)).as("n"))
      .as[(String, String, Double, Double, Long)].collect()
      .groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> r).toMap
      assert(m.contains("head") && m.contains("tail"), s"$lang missing buckets")
      assert(m("head")._3 > m("tail")._4, s"$lang head/tail overlap")
      // terciles are near-balanced (within 2 of each other + ties slack)
      val ns = rows.map(_._5)
      assert(ns.max - ns.min <= math.max(2L, ns.sum / 3), s"$lang skewed: ${ns.toSeq}")
    }
    b.unpersist()
  }

  test("bucketsKn: KN-scored terciles order per language; approx twin agrees") {
    val model = graft.functions.TextAnalysis.kneserNeyModel(
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val score = docs.filter($"doc_id" % 2 === 1)
    val b = Perplexity.bucketsKn(score, "doc_id", "text", "lang", model,
      exact = true).cache()
    // docs with <2 tokens have no scoring positions and drop (t15)
    assert(b.count() ==
      score.filter(size(split($"text", " ")) >= 2).count())
    val byLang = b.groupBy($"lang", $"bucket")
      .agg(min($"mean_logscore").as("lo"), max($"mean_logscore").as("hi"))
      .as[(String, String, Double, Double)].collect().groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> r).toMap
      assert(m.contains("head") && m.contains("tail"), s"$lang missing buckets")
      assert(m("head")._3 > m("tail")._4, s"$lang head/tail overlap")
    }
    val approx = Perplexity.bucketsKn(score, "doc_id", "text", "lang", model)
      .select($"doc_id", $"bucket".as("b_approx"))
    val j = b.select($"doc_id", $"bucket".as("b_exact"))
      .join(approx, Seq("doc_id")).cache()
    val agree = j.filter($"b_exact" === $"b_approx").count().toDouble / j.count()
    assert(agree >= 0.9, s"approx/exact agreement $agree")
    j.unpersist(); b.unpersist()
  }

  test("approx path agrees with exact on nearly all docs and uses no window") {
    val exact = Perplexity.buckets(docs, "doc_id", "text", "lang", exact = true)
      .select($"doc_id", $"bucket".as("b_exact"))
    val approx = Perplexity.buckets(docs, "doc_id", "text", "lang")
      .select($"doc_id", $"bucket".as("b_approx"))
    val j = exact.join(approx, Seq("doc_id")).cache()
    val agree = j.filter($"b_exact" === $"b_approx").count().toDouble / j.count()
    assert(agree >= 0.9, s"approx/exact agreement $agree")
    j.unpersist()
    // the scale path must not rank within language partitions
    assert(!Perplexity.buckets(docs, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString.contains("Window"))
  }
}
