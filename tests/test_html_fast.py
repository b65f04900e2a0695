"""Differential equivalence suite for the fast HTML block scanner.

``_scan_blocks`` (r6 optimization) must be byte-identical to the
``_BlockParser`` reference (html.parser subclass) for every input: same
blocks, same char/link-char counts (link-density decisions), same
behavior on malformed markup.  Structured cases cover every tokenizer
state html.parser distinguishes; the fuzz leg hammers random tag soup.
"""

from __future__ import annotations

import random

import pytest

from hoover_snoop2_spark.operators.html_extract import (
    _BlockParser,
    _scan_blocks,
    extract_blocks,
)


def reference_blocks(text: str) -> list[tuple[str, int, int]]:
    parser = _BlockParser()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    return parser.blocks


STRUCTURED = [
    "",
    "plain text only",
    "<p>hello</p><p>world</p>",
    "<p>a &amp; b &lt;c&gt; &#65; &#x42; &unknown; &amp</p>",
    "<div class='sidebar'>drop me</div><p>keep</p>",
    '<div class="promo">x</div><div class="main">y</div>',
    "<div id=sidebar>bare attr</div><p>ok</p>",
    "<DIV CLASS='PopUp'>upper</DIV><p>ok</p>",
    "<p><a href='x'>link link link</a></p>",
    "<p>text <a href='#'>l</a> more words here</p>",
    "<script>var a = '<p>not a tag</p>';</script><p>after</p>",
    "<style>p { color: red }</style><p>after</p>",
    "<script>unterminated...",
    "<script>xx</script",
    "<SCRIPT>x</SCRIPT><p>ok</p>",
    "<script >x</script ><p>ok</p>",
    "<div class='sidebar'><script>x</script>hidden</div><p>ok</p>",
    "<script><script>nested</script><p>visible?</p>",
    "<!-- comment --><p>a</p>",
    "<!-- unterminated comment <p>x</p>",
    "<!--x--   ><p>weird close</p>",
    "<!DOCTYPE html><p>a</p>",
    "<!doctype html\n<p>unterminated doctype",
    "<![CDATA[ raw <p>stuff</p> ]]><p>after</p>",
    "<![if IE]><p>ms</p><![endif]><p>after</p>",
    "<![unknownsect[ x ]]><p>never reached</p>",
    "<![<p>bogus marked</p>",
    "<!bogus declaration><p>after</p>",
    "<!><p>empty decl</p>",
    "<?php echo '<p>x</p>'; ?><p>after</p>",
    "<?unterminated pi <p>x</p>",
    "a < b and c > d",
    "1 <2 or <3, <p>ok</p>",
    "tail ends with <",
    "tail ends with <p",
    "tail ends with <p attr='x'",
    "tail ends with </p",
    "tail ends with &am",
    "<p/>self closed<br/><hr/>",
    "<p / >odd slash</p>",
    "<p class='x' id='y'>attrs</p>",
    "<p class=\"side&#98;ar\">entity in attr</p>",
    "<p class='a' class='sidebar'>dup attr</p>",
    "<p =bogus>weird</p>",
    "<p foo='bar>quote confusion</p>",
    "<p foo=>empty value</p>",
    "<p foo>valueless</p>",
    "</>empty endtag<p>ok</p>",
    "</ p>space endtag</p>",
    "</p junk>endtag junk<p>ok</p>",
    "<td>cell</td><th>head</th><li>item</li>",
    "<ul><li>a</li><li>b</li></ul>",
    "<table><tr><td>x</td></tr></table>",
    "<br>line<br>break",
    "<a>one</a><a>two</a></a>stray close",
    "<nav>menu</nav><main>content</main>",
    "<header>h</header><footer>f</footer><p>body</p>",
    "<form><input name='q'></form><p>after form</p>",
    "<iframe src='x'>alt</iframe><p>after</p>",
    "<div><div><div>deep</div></div></div>",
    "<div class='sidebar'><div>nested</div>still hidden</div><p>ok</p>",
    "<div class='sidebar'><div class='sidebar'>双</div>x</div><p>ok</p>",
    "<p> &nbsp;  spaces </p>",
    "<p>unicode é ü ß — – …</p>",
    "<p>&eacute;&uuml;&szlig;&mdash;</p>",
    "text<p>block starts</p>text after",
    "  \t\n  <p>  padded  </p>  \n ",
    "<p></p><p> </p><p>.</p><p>ab</p>",
    "<b>not a block</b> same block <i>italic</i>",
    "<h1>Title</h1><h2>Sub</h2>body",
    "<blockquote>q</blockquote><pre>pre\n  formatted</pre>",
    "<p\x00weird>nul in tag</p>",
    "<p\tclass='sidebar'>tab before attr</p>",
    "<svg><circle r='1'/><text>svg text</text></svg><p>after</p>",
    "<template><p>ignored</p></template><p>shown</p>",
    "<button>click</button><select><option>o</option></select><p>t</p>",
    "<head><title>t</title></head><body><p>b</p></body>",
]


@pytest.mark.parametrize("case", range(len(STRUCTURED)))
def test_structured_equivalence(case):
    text = STRUCTURED[case]
    assert _scan_blocks(text) == reference_blocks(text), repr(text)


def test_fuzz_tag_soup_equivalence():
    rng = random.Random(406)
    atoms = [
        "<p>", "</p>", "<div>", "</div>", "<li>", "</li>", "<a href='#'>",
        "</a>", "<b>", "</b>", "<br>", "<br/>", "<script>", "</script>",
        "<style>", "</style>", "<div class='sidebar'>", "<div class=promo>",
        "<span id=\"comment-1\">", "</span>", "<!-- c -->", "<!--", "-->",
        "<!DOCTYPE html>", "<![CDATA[x]]>", "<![if x]>", "<![endif]>",
        "<?pi?>", "<!decl>", "<", ">", "</", "<>", "</>", "&amp;", "&#65;",
        "&#x41;", "&bogus;", "&", "&am", "words here", "x", " ", "\n",
        "\t", "é", " ", "'", '"', "=", "/", "<p", "p>", "<p attr",
        "attr='v'>", "<td>", "</td>", "<h1>", "</h1>", "<ul>", "</ul>",
        "<tag-weird>", "</tag-weird>", "<P>", "</P>", "<A>", "</A>",
    ]
    for trial in range(400):
        k = rng.randrange(1, 40)
        text = "".join(rng.choice(atoms) for _ in range(k))
        assert _scan_blocks(text) == reference_blocks(text), repr(text)


def test_fuzz_random_chars_equivalence():
    rng = random.Random(407)
    alphabet = "<>/!?&;#abcdePZ '\"=-[]\n\t é"
    for trial in range(400):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 120))
        )
        assert _scan_blocks(text) == reference_blocks(text), repr(text)


def test_extract_blocks_scoring_unchanged():
    html = (
        "<html><body><p>main content words</p>"
        "<p><a href='#'>nav nav nav</a></p>"
        "<div class='sidebar'>ad</div><p>x</p>"
        "<li>item text</li></body></html>"
    )
    assert extract_blocks(html) == ["main content words", "item text"]
