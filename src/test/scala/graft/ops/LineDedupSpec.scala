package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LineDedup.dedupLines]] — exact corpus-wide line-grain dedup with
  * globally-first survivors and in-order document reassembly. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val nl = "\n"

  private def run(docs: Seq[(Long, String)], maxCount: Long) =
    LineDedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text",
        maxCount)
      .select("doc_id", "text", "n_lines", "n_kept_lines")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("an over-count line keeps only its globally-first occurrence; " +
      "docs reassemble in original order") {
    val banner = "accept all cookies"
    val docs = Seq(
      (3L, s"c first$nl$banner${nl}c last"),   // corpus-first is by DOC ID,
      (1L, s"a first$nl$banner${nl}a last"),   //   not arrival order: doc 1
      (2L, s"$banner${nl}b only"))             //   at pos 1 wins
    val got = run(docs, maxCount = 1L)
    assert(got(1L)._2 == s"a first$nl$banner${nl}a last")
    assert(got(2L)._2 == "b only")
    assert(got(3L)._2 == s"c first${nl}c last")
    assert(got(1L)._3 == 3L && got(1L)._4 == 3L)
    assert(got(3L)._3 == 3L && got(3L)._4 == 2L)
  }

  test("within one document the earlier position is the survivor") {
    val got = run(Seq((7L, s"refrain${nl}verse${nl}refrain")), 1L)
    assert(got(7L)._2 == s"refrain${nl}verse")
    assert(got(7L)._3 == 3L && got(7L)._4 == 2L)
  }

  test("maxCount thresholds: occurrences at or under the cap all " +
      "survive; one past it collapses to the first") {
    val docs = Seq(
      (1L, s"twice${nl}thrice"),
      (2L, s"twice${nl}thrice"),
      (3L, "thrice"))
    val got2 = run(docs, maxCount = 2L)
    assert(got2(1L)._2 == s"twice${nl}thrice", "count == cap keeps all")
    assert(got2(2L)._2 == "twice", "count 3 > cap 2: doc 1 pos 2 won")
    assert(got2(3L)._2 == "")
    assert(got2(3L)._4 == 0L, "a doc can lose every line")
    val got3 = run(docs, maxCount = 3L)
    assert(got3(2L)._2 == s"twice${nl}thrice" && got3(3L)._2 == "thrice")
  }

  test("blank lines never dedup — paragraph breaks survive everywhere") {
    val docs = Seq(
      (1L, s"para one$nl${nl}para two"),
      (2L, s"intro$nl${nl}body$nl${nl}outro"))
    val got = run(docs, 1L)
    assert(got(1L)._2 == s"para one$nl${nl}para two")
    assert(got(2L)._2 == s"intro$nl${nl}body$nl${nl}outro")
    assert(got(2L)._3 == 5L && got(2L)._4 == 5L)
  }

  test("paragraph grain: sep = blank line dedups whole paragraphs and " +
      "leaves intra-paragraph newlines untouched") {
    val para = s"licensed under${nl}the same terms"
    val docs = Seq(
      (1L, s"intro one$nl$nl$para$nl${nl}outro one"),
      (2L, s"intro two$nl$nl$para"))
      .toDF("doc_id", "text")
    val got = LineDedup.dedupLines(docs, "doc_id", "text", 1L, sep = "\n\n")
      .select("doc_id", "text", "n_lines", "n_kept_lines")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == s"intro one$nl$nl$para$nl${nl}outro one")
    assert(got(2L)._2 == "intro two", "the repeated PARAGRAPH drops whole")
    assert(got(1L)._3 == 3L && got(2L)._3 == 2L && got(2L)._4 == 1L)
  }

  test("deterministic under arrival order and partitioning: the same " +
      "survivors from a reversed, single-partition input") {
    val docs = (1L to 40L).map(i =>
      (i, s"unique line $i${nl}shared boilerplate${nl}tail ${i % 5}"))
    val a = run(docs, 1L)
    val shuffled = docs.reverse.toDF("doc_id", "text").coalesce(1)
    val b = LineDedup.dedupLines(shuffled, "doc_id", "text", 1L)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    docs.foreach { case (id, _) => assert(a(id)._2 == b(id)) }
    // the shared line survives exactly once, in doc 1; "tail k" keeps
    // its first carrier (doc k == 0 -> doc 5's "tail 0" lives in doc 5)
    assert(a(1L)._2 == s"unique line 1${nl}shared boilerplate${nl}tail 1")
    assert(a(2L)._2 == s"unique line 2${nl}tail 2")
    assert(a(6L)._2 == s"unique line 6")
  }
}
