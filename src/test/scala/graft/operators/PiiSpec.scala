package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("t")

  test("counts and redaction for each PII kind") {
    val df = one("mail a.b-c%d@sub.example.org or 192.168.0.1 or 555-867-5309 end")
      .select(
        Pii.emailCount(col("t")).as("e"),
        Pii.ipv4Count(col("t")).as("i"),
        Pii.phoneCount(col("t")).as("p"),
        Pii.redact(col("t")).as("r"))
    val row = df.head()
    assert(row.getInt(0) == 1 && row.getInt(1) == 1 && row.getInt(2) == 1)
    assert(row.getString(3) == "mail <EMAIL> or <IP> or <PHONE> end")
  }

  test("multiple matches all redact; piiCount totals across kinds") {
    val df = one("x@y.com then z@w.net and 10.0.0.1 10.0.0.2")
    assert(df.select(Pii.emailCount(col("t"))).head().getInt(0) == 2)
    assert(df.select(Pii.ipv4Count(col("t"))).head().getInt(0) == 2)
    assert(df.select(Pii.piiCount(col("t"))).head().getInt(0) == 4)
    assert(df.select(Pii.redact(col("t"))).head().getString(0)
      == "<EMAIL> then <EMAIL> and <IP> <IP>")
  }

  test("redaction order: digits in an email's domain are not re-matched as IP/phone") {
    // the email regex consumes the whole address including 10.0.0.1-like
    // domain labels; nothing is left for the IP pass
    val df = one("reach me at bot@10.0.0.1.hosts.example.com now")
    assert(df.select(Pii.redact(col("t"))).head().getString(0) == "reach me at <EMAIL> now")
    assert(df.select(Pii.ipv4Count(col("t"))).head().getInt(0) >= 1,
      "detection counts are per-pattern and MAY overlap — only redaction is ordered")
  }

  test("word boundaries: 4+-digit octets don't match; version strings over-match by design") {
    // \b blocks a 4-digit first octet ("1234." has no boundary inside the run)
    assert(one("v 1234.5.6.7 x").select(Pii.ipv4Count(col("t"))).head().getInt(0) == 0)
    // but "1.2.3.4.5" DOES match its first four octets — \b permits a
    // following dot. Documented pragmatic over-match (same in Java and RE2).
    assert(one("version 1.2.3.4.5 here").select(Pii.ipv4Count(col("t"))).head().getInt(0) == 1)
  }

  test("NULL text: counts null-propagate, redact stays NULL") {
    val df = spark.sql("SELECT cast(null as string) AS t")
    val row = df.select(Pii.emailCount(col("t")), Pii.redact(col("t"))).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("clean text passes through untouched") {
    val s = "no personal data in this sentence at all"
    val row = one(s).select(Pii.piiCount(col("t")), Pii.redact(col("t"))).head()
    assert(row.getInt(0) == 0 && row.getString(1) == s)
  }
}
