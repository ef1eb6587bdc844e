package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.HtmlText
import graft.synth.PageSynth

/** Extraction spec: unit behavior + the per-row invariant from
  * BASELINE.json `input_hint` — byte-identical extracted text per url.
  */
class ExtractSpec extends AnyFunSuite {

  private def x(html: String): String = HtmlText.extract(html.getBytes(UTF_8))

  test("strips inline tags without inserting spaces") {
    assert(x("<p>Zor<b>val</b> Dynamics</p>") == "Zorval Dynamics")
    assert(x("<p><i>a</i><b>b</b></p>") == "ab")
  }

  test("block tags separate blocks with newline; empty blocks dropped") {
    assert(x("<p>one</p><p>two</p>") == "one\ntwo")
    assert(x("<div></div><p>x</p><p> </p>") == "x")
    assert(x("<h2>t</h2><br><p>b</p>") == "t\nb")
  }

  test("script and style content dropped entirely") {
    assert(x("<p>a</p><script>var x = 1; if (x < 2) { x = 3; }</script><p>b</p>") == "a\nb")
    assert(x("<style>p { color: red; }</style><p>c</p>") == "c")
  }

  test("entities decode; nbsp is whitespace; numeric entities") {
    assert(x("<p>a&amp;b &lt;c&gt; &quot;d&quot; &apos;e&apos;</p>") == "a&b <c> \"d\" 'e'")
    assert(x("<p>a&nbsp;b</p>") == "a b")
    assert(x("<p>&#90;orval</p>") == "Zorval")
    assert(x("<p>a &unknown; b</p>") == "a &unknown; b")
  }

  test("whitespace runs collapse; leading/trailing trimmed") {
    assert(x("<p>\n  a   b \n c \n</p>") == "a b c")
    assert(x("<p>  </p>") == "")
  }

  test("attributes and unterminated structures do not crash") {
    assert(x("<p class=\"c1\" id=\"x\">hi</p>") == "hi")
    assert(x("<p>tail<script>never closed") == "tail")
    assert(x("") == "")
    assert(HtmlText.extract(null) == "")
    assert(HtmlText.extract(Array.emptyByteArray) == "")
  }

  test("synthesized pages: extract(html) == text, byte-identical (1000 pages)") {
    var i = 0L
    while (i < 1000L) {
      val p = PageSynth.page(42L, i)
      val got = HtmlText.extract(p.html)
      assert(got == p.text, s"page $i: extracted text differs\nGOT: $got\nEXP: ${p.text}")
      assert(got.getBytes(UTF_8).sameElements(p.text.getBytes(UTF_8)),
        s"page $i: byte-level mismatch")
      i += 1
    }
  }

  test("golden mention offsets index the text exactly") {
    (0L until 200L).foreach { i =>
      val p = PageSynth.page(42L, i)
      p.goldenMentions.foreach { m =>
        assert(p.text.substring(m.begin, m.end) == m.mention)
      }
    }
  }
}
