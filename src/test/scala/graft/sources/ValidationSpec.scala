package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference tests/simple-validate.test.ts behaviors. */
class ValidationSpec extends AnyFunSuite {

  private val schema = Map[String, Any](
    "type" -> "object",
    "required" -> Seq("slug", "name"),
    "properties" -> Map(
      "slug" -> Map("type" -> "string"),
      "name" -> Map("type" -> "string"),
      "count" -> Map("type" -> "integer"),
      "price" -> Map("type" -> "number"),
      "active" -> Map("type" -> "boolean"),
      "when" -> Map("type" -> "date"),
      "maybe" -> Map("type" -> Seq("string", "null")),
      "tags" -> Map("type" -> "array", "items" -> Map("type" -> "string")),
      "meta" -> Map("type" -> "object", "properties" -> Map("k" -> Map("type" -> "string")))
    ))

  private val valid = Map[String, Any](
    "slug" -> "s1", "name" -> "N", "count" -> 3L, "price" -> 1.5,
    "active" -> true, "when" -> "2026-01-02", "maybe" -> null,
    "tags" -> List("a", "b"), "meta" -> Map("k" -> "v"))

  test("valid record passes") {
    Validation.validateRecord(valid, schema)
  }

  test("missing required field") {
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid - "name", schema))
    assert(e.getMessage.contains("Missing required field: 'value.name'"))
  }

  test("wrong primitive types reported with path") {
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("count" -> "not-a-number"), schema))
    assert(e.getMessage.contains("value.count"))
    val e2 = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("active" -> "yes"), schema))
    assert(e2.getMessage.contains("value.active"))
  }

  test("array item validation recurses with index in path") {
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("tags" -> List("a", 5L)), schema))
    assert(e.getMessage.contains("value.tags[1]"))
  }

  test("nested object property validation") {
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("meta" -> Map("k" -> 9L)), schema))
    assert(e.getMessage.contains("value.meta.k"))
  }

  test("union types: null allowed where declared, rejected otherwise") {
    Validation.validateRecord(valid + ("maybe" -> "text"), schema)
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("name" -> null), schema))
    assert(e.getMessage.contains("got null"))
  }

  test("date type accepts ISO strings, rejects junk") {
    Validation.validateRecord(valid + ("when" -> "2026-08-12"), schema)
    val e = intercept[IllegalArgumentException](
      Validation.validateRecord(valid + ("when" -> "not a date"), schema))
    assert(e.getMessage.contains("value.when"))
  }
}
