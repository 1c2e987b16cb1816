package graft

import org.apache.spark.sql.DataFrame
import graft.operators.HtmlOps

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pages(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "html")

  // a prose body that clears the stopword-density rule (150 permille)
  // even though it is shorter than the 100-char long-block rescue
  private val prose =
    "the cat sat on a mat and the dog ran to the park"

  private def run(rows: (Long, String)*): Map[Long, (String, Long, Long)] =
    HtmlOps.extractText(pages(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_blocks_kept"),
          r.getAs[Long]("n_blocks_dropped")))).toMap

  test("body preserved byte-exact, nav and footer boilerplate dropped") {
    val html =
      s"""<html><head><title>My Page</title></head><body>
         |<div class="nav"><a href="/">Home</a> <a href="/x">About</a> <a href="/y">Contact</a></div>
         |<p>$prose</p>
         |<div class="footer"><a href="/p">Privacy</a> | <a href="/t">Terms</a></div>
         |</body></html>""".stripMargin.replace("\n", "")
    val (txt, kept, dropped) = run(1L -> html)(1L)
    assert(txt == prose, s"body must survive byte-exact, got <$txt>")
    assert(kept == 1L)
    // dropped: title block ("My Page" — short, stopword-free), nav,
    // footer; empty inter-tag blocks are not counted at all
    assert(dropped == 3L)
  }

  test("script and style contents never leak into clean text") {
    val html =
      s"""<html><head><style>p { color: red }</style>
         |<script>if (1 < 2) { alert("the of and to in") }</script></head>
         |<body><p>$prose</p></body></html>""".stripMargin.replace("\n", "")
    val (txt, _, _) = run(1L -> html)(1L)
    assert(txt == prose)
    assert(!txt.contains("alert") && !txt.contains("color"))
  }

  test("long stopword-sparse blocks survive via the length rescue") {
    val salad = "alpha beta gamma delta epsilon zeta eta theta " * 4 // 188 chars
    val html = s"<body><p>${salad.trim}</p></body>"
    val (txt, kept, _) = run(1L -> html)(1L)
    assert(kept == 1L && txt == salad.trim)
    // the same content truncated below minLongChars is dropped
    val shortSalad = "alpha beta gamma delta epsilon"
    val (txt2, kept2, dropped2) = run(1L -> s"<body><p>$shortSalad</p></body>")(1L)
    assert(kept2 == 0L && dropped2 == 1L && txt2 == "")
  }

  test("link farms are dropped however long they are") {
    val farm = (1 to 30)
      .map(i => s"""<a href="/$i">the link number $i of the site</a>""")
      .mkString(" ")
    val (txt, kept, dropped) = run(1L -> s"<body><div>$farm</div></body>")(1L)
    assert(kept == 0L && dropped == 1L && txt == "")
  }

  test("kept blocks reassemble in page order") {
    val html = s"<body><p>$prose</p><p>and then the dog sat on the mat too</p></body>"
    val (txt, kept, _) = run(1L -> html)(1L)
    assert(kept == 2L)
    assert(txt == prose + "\n" + "and then the dog sat on the mat too")
  }

  test("all-boilerplate pages come back empty, never missing") {
    val got = run(
      1L -> s"<body><p>$prose</p></body>",
      2L -> """<body><div><a href="/">Home</a> <a href="/x">About</a></div></body>""",
      3L -> "")
    assert(got.keySet == Set(1L, 2L, 3L), "every input doc_id is retained")
    assert(got(2L) == (("", 0L, 1L)))
    assert(got(3L) == (("", 0L, 0L)))
  }
}
