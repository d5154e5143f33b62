package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Pii

/** The native fused PiiStats must match the regexp_* column algebra exactly
  * — same patterns, same engine, so any divergence is a wiring bug.
  */
class PiiParitySpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "mail a.b-c%d@sub.example.org or 192.168.0.1 or 555-867-5309 end",
    "x@y.com then z@w.net and 10.0.0.1 10.0.0.2",
    "reach me at bot@10.0.0.1.hosts.example.com now",
    "v 1234.5.6.7 x and version 1.2.3.4.5 here",
    "no personal data in this sentence at all",
    "",
    "edge a@b.co.uk1 tail",           // greedy-{2,} backtrack edge
    "call 555-8675-309 and 555-867-53090", // phone boundary edges
    "dots..everywhere..@..dots..",
    "трудно@пример.рф ascii-only classes must not match this",
    // seam edge: the email match ends at "com", leaving "1.2.3.4" digit-run
    // adjacent; in the ORIGINAL no \b precedes it (after 'm'... the '1' run
    // starts inside a word), but after redaction '>' creates the boundary —
    // so n_ips = 0 while the redacted text contains <IP>. Both impls must
    // agree on exactly that.
    "x a@b.com1.2.3.4 y"
  )

  test("native PiiStats == column twins on every edge case") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val native = df.select(col("id"), PiiExpressions.piiStats(col("t")).as("p"))
      .select(col("id"), col("p.n_emails"), col("p.n_ips"), col("p.n_phones"), col("p.redacted"))
    val twin = df.select(col("id"),
      Pii.emailCount(col("t")).as("n_emails"),
      Pii.ipv4Count(col("t")).as("n_ips"),
      Pii.phoneCount(col("t")).as("n_phones"),
      Pii.redact(col("t")).as("redacted"))
    assert(native.except(twin).isEmpty && twin.except(native).isEmpty,
      s"native vs twin diverged:\nnative: ${native.collect().mkString("\n")}\n" +
      s"twin: ${twin.collect().mkString("\n")}")
  }

  test("NULL text → NULL struct, like the twins") {
    val row = spark.sql("SELECT cast(null as string) AS t")
      .select(PiiExpressions.piiStats(col("t"))).head()
    assert(row.isNullAt(0))
  }
}
