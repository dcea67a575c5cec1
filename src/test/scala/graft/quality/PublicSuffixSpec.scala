package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def reg(hosts: String*): Seq[String] = {
    val df = hosts.toDF("host")
      .select(PublicSuffix.registrableFromHost(col("host")).as("d"))
    df.as[String].collect().toSeq
  }

  test("generic TLDs keep two labels (subdomains stripped)") {
    assert(reg("example.com", "a.b.example.com", "www.example.org") ==
      Seq("example.com", "example.com", "example.org"))
  }

  test("2-label public suffixes keep three labels") {
    assert(reg("foo.co.uk", "bar.foo.co.uk", "www.news.com.au", "x.com.br") ==
      Seq("foo.co.uk", "foo.co.uk", "news.com.au", "x.com.br"))
  }

  test("3-label public suffixes keep four labels") {
    assert(reg("school.wa.edu.au", "www.school.wa.edu.au") ==
      Seq("school.wa.edu.au", "school.wa.edu.au"))
  }

  test("a 3-label host whose last 2 labels are generic is NOT over-kept") {
    // edu.au is a suffix, but plain example.au is not in any tier →
    // generic two-label rule
    assert(reg("a.example.au") == Seq("example.au"))
  }

  test("bare public suffix and sub-registrable hosts degrade gracefully") {
    // a host that IS a suffix has no registrable domain per the PSL;
    // the curation convention returns the suffix itself
    assert(reg("co.uk") == Seq("co.uk"))
    assert(reg("localhost") == Seq(""))
  }

  test("registrableDomain composes with URL host extraction") {
    val d = Seq("https://WWW.Foo.CO.UK/p?x=1").toDF("url")
      .select(PublicSuffix.registrableDomain(col("url")).as("d"))
      .as[String].head()
    assert(d == "foo.co.uk")
  }

  test("suffix-table variant matches the embedded default and guards size") {
    val table = (PublicSuffix.Default2 ++ PublicSuffix.Default3).toDF("suffix")
    val hosts = Seq("bar.foo.co.uk", "www.school.wa.edu.au", "a.example.com")
      .toDF("host")
    val a = hosts.select(PublicSuffix.registrableFromHost(col("host"))
      .as("d")).as[String].collect().toSeq
    val b = hosts.select(PublicSuffix.registrableFromHost(col("host"),
      table, maxEntries = 20000).as("d")).as[String].collect().toSeq
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      PublicSuffix.registrableFromHost(col("host"), table, maxEntries = 3)
    }
    assert(e.getMessage.contains("guard"))
  }

  test("extraction is map-side: no exchange, suffix sets as hashed InSet") {
    val df = spark.range(0, 1000)
      .select(concat(lit("sub.d"), col("id"), lit(".co.uk")).as("host"))
      .select(PublicSuffix.registrableFromHost(col("host")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // >10 literals compile to the O(1) hashed InSet form
    assert(plan.contains("INSET") || plan.contains("inset"), plan.take(800))
  }
}
