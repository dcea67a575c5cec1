package graft.quality

class RedactSpec extends graft.SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Redact.redactPii($"t")).as[String].head()

  test("emails, IPs, phones and long digit runs are replaced") {
    assert(redact("mail bob.smith+x@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(redact("host 10.0.255.7 down") == "host <IP> down")
    assert(redact("call 555-867-5309 or +1 555 123 4567") ==
      "call <PHONE> or <PHONE>")
    assert(redact("acct 1234567890 ok") == "acct <NUM> ok")
  }

  test("pattern order: email digits and IP quads never leak into NUM/PHONE") {
    // the email contains a 10-digit run; it must become <EMAIL>, not <NUM>
    assert(redact("a 1234567890@example.com b") == "a <EMAIL> b")
    // the dotted quad is consumed by IP before the dot-separated phone
    // pattern could bite into it
    assert(redact("ip 1.2.3.4 tel 555.123.4567") == "ip <IP> tel <PHONE>")
  }

  test("non-PII text survives untouched") {
    val clean = "version v1.2.3 shipped 42 units to 8 sites"
    assert(redact(clean) == clean)
    assert(redact("short 12345678 run") == "short 12345678 run") // 8 < 9 digits
  }

  test("census: per-class counts follow redaction precedence") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // 2 emails (one with a 10-digit local part that must NOT also
    // count as a digit run), 1 ip, 1 phone, 1 digit run
    val s = "a1234567890@x.org and b@y.net, ip 10.0.0.1, " +
      "call 555-123-4567, acct 987654321 end"
    val cs = Redact.piiCensus(lit(s))
    val row = Seq(1).toDF("i")
      .select(cs.map { case (n, c) => c.as(n) }: _*).collect().head
    assert(row.getAs[Long]("email") == 2L)
    assert(row.getAs[Long]("ip") == 1L)
    assert(row.getAs[Long]("phone") == 1L)
    assert(row.getAs[Long]("num") == 1L, "email digits must not recount")
    // clean text censuses to all zeros
    val zeros = Seq(1).toDF("i")
      .select(Redact.piiCensus(lit("nothing here 42")).map {
        case (n, c) => c.as(n) }: _*).collect().head
    assert((0 until 4).forall(zeros.getLong(_) == 0L))
  }
}
