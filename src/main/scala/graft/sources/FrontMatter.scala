package graft.sources

/** Markdown front-matter extraction, mirroring the reference
  * (reference: src/parser/frontMatter.ts:11-24): a leading `---` block parsed
  * as YAML becomes the record's attributes; an array front-matter contributes
  * its first element. The body is returned too (the reference drops it for
  * indexing but keeps `raw` on loads — we expose both).
  */
object FrontMatter {

  private val Fm = "(?s)^---\\s*\\n(.*?)\\n---\\s*\\n?(.*)$".r

  /** @return (attributes, body) */
  def parse(rawContent: String): (Map[String, Any], String) = rawContent match {
    case Fm(block, body) =>
      MiniYaml.parse(block) match {
        case m: Map[_, _]            => (m.asInstanceOf[Map[String, Any]], body)
        case (m: Map[_, _]) :: _     => (m.asInstanceOf[Map[String, Any]], body)
        case _                       => (Map.empty, body)
      }
    case _ => (Map.empty, rawContent)
  }
}
