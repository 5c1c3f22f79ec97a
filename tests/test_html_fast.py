"""Differential equality: the fast tokenizer vs the stdlib html.parser
path. Both drive the same _BlockParser handlers; extract_main output
must be IDENTICAL (dict equality, spans included) on everything —
corpus pages, adversarial handcrafted markup, and hypothesis-composed
junk. A divergence here is a correctness bug in the fast lane, never a
tolerable delta: the stdlib path is the specification.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.sources import synth
from ocr_spark.textlib import htmltext


def both(html: str):
    return (htmltext.extract_main(html, engine="fast"),
            htmltext.extract_main(html, engine="stdlib"))


@pytest.mark.parametrize("i", list(range(35)) + [96, 595])
def test_corpus_pages_identical(i):
    r = synth.make_web_row(i)
    if not r["html"]:
        return
    fast, std = both(r["html"].decode("utf-8"))
    assert fast == std


NASTY = [
    # well-formed baseline
    '<html><body><article><p>Hello, world text here.</p></article></body></html>',
    # self-closing zoo (<a href=x/> is NOT self-closing, <br/> is)
    '<p>a<br/>b</p><div /><a href=/x/>link</a><input type=text/>',
    # quotes hiding '>' and '<'
    '<a href="x>y" class="sidebar">quoted gt</a><p title=\'a<b\'>t</p>',
    # uppercase names/attrs
    '<DIV CLASS="SIDEBAR"><P>upper</P></DIV><ARTICLE><P>Real text, kept here.</P></ARTICLE>',
    # entities: named, numeric, missing semicolon, bogus
    '<p>&amp; &#65; &#x41; &amp &notanentity; &lt;tag&gt;</p>',
    # script/style cdata with false closers
    '<script>if (a</scriptx>) { x = "</style>"; }</script><p>after script, visible.</p>',
    '<style>.x{content:"</p>"}</style><p>after style stays.</p>',
    '<script>unterminated cdata swallows the rest',
    '<script>x</script foo="bar">still script</script><p>out now.</p>',
    # comments, doctype, PI, marked sections, bogus decls
    '<!doctype html><!-- c1 --><p>a</p><!-- unterminated',
    '<?php echo 1; ?><![CDATA[ <p>not a tag</p> ]]><p>b</p>',
    '<!weird decl><p>c</p><! another>',
    # stray / bogus tags
    '<p>x</p></><3 < 5<p>y</p></ div></nosuchopen>',
    '<p>a</p></p extra="attr"><p>b</p>',
    # unterminated constructs at EOF
    '<p>text then <a href="x',
    '<p>text then <div',
    '<p>tail<',
    # malformed per corpus variant 1: unclosed div + stray end tags
    '<div class="sidebar"><a href="/x">links</a><article><h2>Head Line Title</h2>'
    + "".join(f'<p>Paragraph {j} with a comma, and plenty of votes to carry it.'
              for j in range(5)) + '</article></span></em>',
    # nested identical tags / implied p-close
    '<div><div><div><p>one<p>two<p>three</div></div></div>',
    # table soup
    '<table><tr><td>a<td>b<tr><td>c</table>',
    # attr entity in class value
    '<div class="side&#98;ar">pruned by entity-decoded class?</div><p>keep this text.</p>',
    # title edge cases
    '<title>T &amp; T</title><p>body text here</p><title>second</title>',
    # void elements with weird forms
    '<br><br /><hr/><img src="x"><meta charset="utf-8">',
]


@pytest.mark.parametrize("idx", range(len(NASTY)))
def test_nasty_markup_identical(idx):
    fast, std = both(NASTY[idx])
    assert fast == std


_atoms = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<br>",
    "<br/>", "<a href=x/>", "<div />", "</>", "</ div>", "<3", "<",
    "&amp;", "&#65;", "&amp", "&bogus;", "&", "plain, words here. ",
    "Sentences with enough prose to vote, like articles do. ",
    '<div class="sidebar">', '<DIV CLASS="MENU">', "<nav>", "</nav>",
    "<article>", "</article>", "<h1>", "</h1>", "<title>", "</title>",
    "<script>var x=1;</script>", "<script>open", "</scriptx>",
    "<style>.a{}</style>", "<!-- c -->", "<!-- open", "<!doctype html>",
    "<![CDATA[x]]>", "<![open", "<? pi ?>", "<!decl>", "<table><tr><td>",
    "</td></tr></table>", '<p title="a>b">', "<a href=\"x", "<div",
])


@given(st.lists(_atoms, max_size=30).map("".join))
@settings(max_examples=300, deadline=None)
def test_hypothesis_markup_identical(junk):
    fast, std = both(junk)
    assert fast == std
