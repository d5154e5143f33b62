package graft.plans

import graft.{SparkSpec, Tables}

/** The RELY trust-contract audit (Constraints.validateRely): declarations the
  * data satisfies report clean; violated uniqueness (duplicates, nulls) and
  * violated FK totality (orphan child keys) are each reported.
  */
class RelyAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the star-schema catalog's derived RELY declarations hold on the data") {
    Tables.catalog(spark, dir)
    val violations =
      Constraints.validateRely(spark, tag => tag.contains("sf0.001"))
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("violated declarations are reported: duplicate/null uniques and orphan FKs") {
    val tmp = java.nio.file.Files.createTempDirectory("rely_audit").toString
    val s = spark
    import s.implicits._
    // parent pk has a duplicate (2) and a null
    Seq(Option(1L), Option(2L), Option(2L), Option.empty[Long])
      .map(_.map(java.lang.Long.valueOf).orNull).toDF("pk")
      .write.mode("overwrite").parquet(s"$tmp/parent")
    // child fk=9 has no parent (orphan); null fk is NOT a violation
    Seq((1L, Some(1L)), (2L, Some(9L)), (3L, None))
      .map { case (id, fk) => (id, fk.map(java.lang.Long.valueOf).orNull) }
      .toDF("id", "fk").write.mode("overwrite").parquet(s"$tmp/child")
    val parentTag = Constraints.tagOf(s.read.parquet(s"$tmp/parent")).get
    val childTag  = Constraints.tagOf(s.read.parquet(s"$tmp/child")).get
    Constraints.register(parentTag, Constraints.TableConstraints(Set("pk"), Nil))
    Constraints.register(childTag, Constraints.TableConstraints(Set("id"),
      Seq(Constraints.Fk("fk", parentTag, "pk"))))
    val vs = Constraints.validateRely(s, t => t == parentTag || t == childTag)
    assert(vs.exists(v => v.tag == parentTag && v.constraint == "unique(pk)" &&
      v.detail.contains("null")), vs.mkString("\n"))
    assert(vs.exists(v => v.tag == parentTag && v.constraint == "unique(pk)" &&
      v.detail.contains("duplicate")), vs.mkString("\n"))
    assert(vs.exists(v => v.tag == childTag && v.constraint.startsWith("fk(fk") &&
      v.detail.contains("1 child key")), vs.mkString("\n"))
    // the clean declaration on the same tables reports nothing extra
    assert(!vs.exists(_.constraint == "unique(id)"), vs.mkString("\n"))
  }
}
