package graft.pipeline

import scala.collection.mutable

/** Minimal YAML-subset parser — just enough for pipeline spec files shaped
  * like the reference's `pipelines/observability_correlation_pipeline.yaml`:
  * nested maps by 2-space indentation, scalar values (optionally quoted),
  * inline string lists `["a", "b"]`, and `#` comments. Key order preserved
  * (the reference relies on stage declaration order).
  *
  * Hand-rolled because the build is dependency-free beyond Spark; a YAML
  * library would be strictly larger than this file.
  */
object Yaml {

  sealed trait Node
  final case class YMap(entries: Vector[(String, Node)]) extends Node {
    def apply(key: String): Node = get(key).getOrElse(
      throw new NoSuchElementException(s"missing key '$key' in ${entries.map(_._1)}"))
    def get(key: String): Option[Node] = entries.find(_._1 == key).map(_._2)
    def keys: Vector[String] = entries.map(_._1)
  }
  final case class YStr(value: String) extends Node
  final case class YList(values: Vector[String]) extends Node

  def str(n: Node): String = n match {
    case YStr(s) => s
    case other   => throw new IllegalArgumentException(s"expected scalar, got $other")
  }

  def parse(text: String): YMap = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.takeWhile(_ == ' ').length, stripComment(l).trim, i) }
      .filter(_._2.nonEmpty)
      .toVector
    val (node, rest) = parseBlock(lines, 0)
    require(rest.isEmpty, s"trailing content at line ${rest.head._3 + 1}")
    node
  }

  private def stripComment(l: String): String = {
    // strip a # not inside quotes
    var inQ = false
    val sb = new StringBuilder
    for (c <- l) {
      if (c == '"') inQ = !inQ
      if (c == '#' && !inQ) return sb.toString()
      sb.append(c)
    }
    sb.toString()
  }

  private def parseBlock(
      lines: Vector[(Int, String, Int)],
      indent: Int): (YMap, Vector[(Int, String, Int)]) = {
    val entries = mutable.ArrayBuffer.empty[(String, Node)]
    var rest = lines
    while (rest.nonEmpty && rest.head._1 == indent) {
      val (_, content, lineNo) = rest.head
      val colon = content.indexOf(':')
      require(colon > 0, s"expected 'key:' at line ${lineNo + 1}: $content")
      val key = unquote(content.substring(0, colon).trim)
      val after = content.substring(colon + 1).trim
      rest = rest.tail
      if (after.isEmpty) {
        val childIndent = rest.headOption.map(_._1).getOrElse(indent)
        if (rest.nonEmpty && childIndent > indent) {
          val (child, r) = parseBlock(rest, childIndent)
          entries += key -> child
          rest = r
        } else entries += key -> YStr("")
      } else entries += key -> parseScalar(after)
    }
    (YMap(entries.toVector), rest)
  }

  private def parseScalar(s: String): Node =
    if (s.startsWith("[") && s.endsWith("]")) {
      val inner = s.substring(1, s.length - 1).trim
      if (inner.isEmpty) YList(Vector.empty)
      else YList(inner.split(',').map(v => unquote(v.trim)).toVector)
    } else YStr(unquote(s))

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
