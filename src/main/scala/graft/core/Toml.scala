package graft.core

import scala.collection.immutable.ListMap

/** Minimal TOML codec for the metadata files (`_dataset.toml`,
  * `_graft.toml`) — reference persists dataset/snapshot/catalog config as
  * TOML (`dataset/timefly.py`, `datalake/manager.py`, fixture
  * `test.toml:1-27`). Supports the subset those files use: nested tables,
  * strings, ints, doubles, booleans, flat arrays. `None` values round-trip
  * as the string "None" (reference `utils/base.py:78-135`
  * NestedDictReplacer). No external deps (offline build).
  */
object Toml {
  sealed trait Value
  final case class Str(v: String) extends Value
  final case class Num(v: Double) extends Value
  final case class Int64(v: Long) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Arr(v: Seq[Value]) extends Value
  final case class Tbl(v: ListMap[String, Value]) extends Value

  object Tbl {
    def apply(kvs: (String, Value)*): Tbl = Tbl(ListMap(kvs: _*))
    val empty: Tbl = Tbl(ListMap.empty[String, Value])
  }

  // ------------------------------------------------------------- render
  def render(root: Tbl): String = {
    val sb = new StringBuilder
    def scalars(t: Tbl): Seq[(String, Value)] = t.v.toSeq.filter(!_._2.isInstanceOf[Tbl])
    def tables(t: Tbl): Seq[(String, Tbl)] = t.v.toSeq.collect { case (k, v: Tbl) => (k, v) }
    def walk(prefix: Seq[String], t: Tbl): Unit = {
      if (prefix.nonEmpty && (scalars(t).nonEmpty || t.v.isEmpty)) {
        sb.append("[").append(prefix.map(quoteKey).mkString(".")).append("]\n")
      }
      scalars(t).foreach { case (k, v) =>
        sb.append(quoteKey(k)).append(" = ").append(renderVal(v)).append("\n")
      }
      if (scalars(t).nonEmpty) sb.append("\n")
      tables(t).foreach { case (k, sub) => walk(prefix :+ k, sub) }
    }
    walk(Nil, root)
    sb.toString
  }

  private def quoteKey(k: String): String =
    if (k.matches("[A-Za-z0-9_-]+")) k else "\"" + escape(k) + "\""

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    }

  private def renderVal(v: Value): String = v match {
    case Str(s) => "\"" + escape(s) + "\""
    case Num(d) => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) f"$d%.1f" else d.toString
    case Int64(l) => l.toString
    case Bool(b) => b.toString
    case Arr(xs) => xs.map(renderVal).mkString("[", ", ", "]")
    case t: Tbl => throw new IllegalArgumentException("inline tables unsupported")
  }

  // -------------------------------------------------------------- parse
  /** Trailing comments are TOML: `[maintenance] # note` and
    * `count = 1 # note` are what an operator hand-editing the
    * (documented operator-facing) config writes. Cut at the first '#'
    * outside a quoted string — without this the section form crashes
    * the whole parse and the key form silently corrupts the value to
    * `Str("1 # note")`. */
  private def stripComment(l: String): String = {
    var i = 0; var inQ = false
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '"' && isRealQuote(l, i)) inQ = !inQ
      else if (c == '#' && !inQ) return l.substring(0, i)
      i += 1
    }
    l
  }

  def parse(text: String): Tbl = {
    var root = ListMap.empty[String, Value]
    var path: Seq[String] = Nil
    text.linesIterator.map(l => stripComment(l.trim).trim).filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("[") && line.endsWith("]")) {
        path = splitKeyPath(line.substring(1, line.length - 1))
        root = ensure(root, path)
      } else {
        val eq = indexOfTopLevel(line, '=')
        require(eq > 0, s"bad toml line: $line")
        val key = unquoteKey(line.substring(0, eq).trim)
        val value = parseVal(line.substring(eq + 1).trim)
        root = put(root, path, key, value)
      }
    }
    Tbl(root)
  }

  private def splitKeyPath(s: String): Seq[String] = {
    // handles a.b."c.d" dotted paths. Quotes are KEPT during the scan
    // (so unquoteKey can unescape each segment) and only REAL quotes
    // toggle the string state — an escaped quote in a section key
    // (["quo\"te"]) would otherwise flip it mid-key and corrupt the
    // segment (found by the TOML roundtrip property).
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0; val cur = new StringBuilder
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && isRealQuote(s, i)) { inQ = !inQ; cur.append(c) }
      else if (c == '.' && !inQ) { out += cur.toString.trim; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString.trim
    out.toSeq.map(unquoteKey)
  }

  private def unquoteKey(k: String): String =
    // length >= 2: a lone quote character (malformed header like ["])
    // would otherwise hit substring(1, 0) and crash instead of parsing
    if (k.length >= 2 && k.startsWith("\"") && k.endsWith("\"")) unescape(k.substring(1, k.length - 1)) else k

  private def unescape(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case x => sb.append(x)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** A quote is escaped iff preceded by an ODD number of backslashes —
    * `\\"` is an escaped backslash then a real quote, not an escaped
    * quote (a string value ending in '\' would otherwise never close). */
  private def isRealQuote(s: String, i: Int): Boolean = {
    var bs = 0; var j = i - 1
    while (j >= 0 && s.charAt(j) == '\\') { bs += 1; j -= 1 }
    bs % 2 == 0
  }

  private def indexOfTopLevel(s: String, ch: Char): Int = {
    var i = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && isRealQuote(s, i)) inQ = !inQ
      else if (c == ch && !inQ) return i
      i += 1
    }
    -1
  }

  private def parseVal(s: String): Value = s match {
    case q if q.startsWith("\"") && q.endsWith("\"") && q.length >= 2 =>
      Str(unescape(q.substring(1, q.length - 1)))
    case "true" => Bool(true)
    case "false" => Bool(false)
    case a if a.startsWith("[") && a.endsWith("]") =>
      val inner = a.substring(1, a.length - 1).trim
      if (inner.isEmpty) Arr(Nil)
      else Arr(splitTopLevel(inner, ',').map(x => parseVal(x.trim)))
    case n if n.matches("[+-]?\\d+") => Int64(n.toLong)
    case n if n.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") => Num(n.toDouble)
    case other => Str(other) // tolerate bare strings (dates etc.)
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // escaped quotes (\") do NOT toggle the string state — same rule
      // as indexOfTopLevel, else a value like "a\",b" splits mid-string
      if (c == '"' && isRealQuote(s, i)) { inQ = !inQ; cur.append(c) }
      else if (c == '[' && !inQ) { depth += 1; cur.append(c) }
      else if (c == ']' && !inQ) { depth -= 1; cur.append(c) }
      else if (c == sep && depth == 0 && !inQ) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def ensure(root: ListMap[String, Value], path: Seq[String]): ListMap[String, Value] =
    path match {
      case Seq() => root
      case head +: tail =>
        val sub = root.get(head) match {
          case Some(Tbl(m)) => m
          case _ => ListMap.empty[String, Value]
        }
        root.updated(head, Tbl(ensure(sub, tail)))
    }

  private def put(root: ListMap[String, Value], path: Seq[String], key: String, v: Value): ListMap[String, Value] =
    path match {
      case Seq() => root.updated(key, v)
      case head +: tail =>
        val sub = root.get(head) match {
          case Some(Tbl(m)) => m
          case _ => ListMap.empty[String, Value]
        }
        root.updated(head, Tbl(put(sub, tail, key, v)))
    }

  // ------------------------------------------------------------ helpers
  def getTbl(t: Tbl, path: String*): Option[Tbl] =
    path.foldLeft(Option(t)) { (acc, k) =>
      acc.flatMap(_.v.get(k).collect { case x: Tbl => x })
    }
  def getStr(t: Tbl, key: String): Option[String] =
    t.v.get(key).collect { case Str(s) => s }
  def getArr(t: Tbl, key: String): Seq[String] =
    t.v.get(key).collect { case Arr(xs) => xs.collect { case Str(s) => s } }.getOrElse(Nil)
}
