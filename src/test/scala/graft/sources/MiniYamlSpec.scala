package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Parser-semantics parity with the reference's YAML subset
  * (reference: tests/yaml-parser.test.ts). */
class MiniYamlSpec extends AnyFunSuite {

  test("scalar values: string, number, float, booleans, null") {
    assert(MiniYaml.parse("name: foo") == Map("name" -> "foo"))
    assert(MiniYaml.parse("count: 42") == Map("count" -> 42L))
    assert(MiniYaml.parse("price: 3.14") == Map("price" -> 3.14))
    assert(MiniYaml.parse("active: true") == Map("active" -> true))
    assert(MiniYaml.parse("active: false") == Map("active" -> false))
    assert(MiniYaml.parse("value: null") == Map("value" -> null))
  }

  test("values containing colons (URLs) survive") {
    assert(MiniYaml.parse("url: https://example.com/path") ==
      Map("url" -> "https://example.com/path"))
  }

  test("inline arrays, single- and multi-line") {
    assert(MiniYaml.parse("tags: [a, b, c]") == Map("tags" -> List("a", "b", "c")))
    assert(MiniYaml.parse("tags: ['a', \"b\"]") == Map("tags" -> List("a", "b")))
    val multi = "tags: [a,\n  b,\n  c]"
    assert(MiniYaml.parse(multi) == Map("tags" -> List("a", "b", "c")))
  }

  test("nested objects by indentation") {
    val y = "outer:\n  inner: v\n  deep:\n    leaf: 1"
    assert(MiniYaml.parse(y) ==
      Map("outer" -> Map("inner" -> "v", "deep" -> Map("leaf" -> 1L))))
  }

  test("block arrays of objects (herbStates.yaml shape)") {
    val y = "- slug: dry\n  name: Dried\n- slug: fresh\n  name: Fresh"
    assert(MiniYaml.parse(y) == List(
      Map("slug" -> "dry", "name" -> "Dried"),
      Map("slug" -> "fresh", "name" -> "Fresh")))
  }

  test("nested block array under a key") {
    val y = "items:\n  - a\n  - b\nname: x"
    assert(MiniYaml.parse(y) == Map("items" -> List("a", "b"), "name" -> "x"))
  }

  test("comments and blank lines are skipped") {
    val y = "# header\n\nname: foo\n# trailing"
    assert(MiniYaml.parse(y) == Map("name" -> "foo"))
  }

  test("toJson renders a canonical JSON document") {
    val ast = Map("a" -> 1L, "b" -> List("x", "y"), "c" -> Map("d" -> true), "e" -> null)
    assert(MiniYaml.toJson(ast) == """{"a":1,"b":["x","y"],"c":{"d":true},"e":null}""")
  }

  test("front-matter extraction (arctium-lappa.md shape)") {
    val md =
      """---
        |name: Burdock
        |compoundSlugs: [inulin, arctigenin]
        |overview: root vegetable
        |efficacy:
        |---
        |
        |## Body heading
        |
        |Body text
        |""".stripMargin
    val (attrs, body) = FrontMatter.parse(md)
    assert(attrs("name") == "Burdock")
    assert(attrs("compoundSlugs") == List("inulin", "arctigenin"))
    assert(attrs("efficacy") == null)
    assert(body.contains("## Body heading"))
  }

  test("markdown without front-matter yields empty attributes") {
    val (attrs, body) = FrontMatter.parse("just text")
    assert(attrs.isEmpty && body == "just text")
  }

  test("MiniJson parses objects, arrays, escapes, numbers") {
    assert(MiniJson.parse("""{"a": [1, 2.5, "x\n", true, null]}""") ==
      Map("a" -> List(1L, 2.5, "x\n", true, null)))
    intercept[IllegalArgumentException](MiniJson.parse("""{"a": }"""))
  }

  test("MiniJson \\u escapes: valid decodes, malformed raises positioned error") {
    assert(MiniJson.parse("\"\\u0041\\u00e9\"") == "Aé")
    // non-hex and SIGNED 'hex' (parseInt would accept "-abc") both reject
    // inside the parser's IllegalArgumentException contract
    val e1 = intercept[IllegalArgumentException](MiniJson.parse("\"\\uZZZZ\""))
    assert(e1.getMessage.contains("\\u"))
    intercept[IllegalArgumentException](MiniJson.parse("\"\\u-abc\""))
    intercept[IllegalArgumentException](MiniJson.parse("\"\\u+abc\""))
    intercept[IllegalArgumentException](MiniJson.parse("\"\\u00\"")) // truncated
    // non-ASCII Unicode digits (Character.digit accepts them; JSON does not):
    // fullwidth '０' (U+FF10) and Arabic-Indic '٠' (U+0660)
    intercept[IllegalArgumentException](MiniJson.parse("\"\\u\uFF10041\""))
    intercept[IllegalArgumentException](MiniJson.parse("\"\\u\u0660041\""))
  }
}
