"""Mini-DOM: selector subset + get_text semantics (bs4-equivalent for the
operations the reference parsers use)."""

import re

from game_review_crawler_ray.functions.minidom import parse_html


HTML = """
<html><body>
<div id="content" class="wrap main">
  <h1 class="title">Hello <b>World</b></h1>
  <article><div class="content"><p>one </p>
  <p> two</p></div></article>
  <span class="title_headtext">head</span><span>after</span>
  <div class="comments">
    <div class="comment"><span class="author">kim</span><span class="content">nice</span></div>
    <div class="comment"><span class="content">anon text</span></div>
  </div>
  <time datetime="2024-01-02T03:04:05Z">Jan 2</time>
</div>
<script>var x = "<p>not text</p>";</script>
</body></html>
"""


def test_select_compound_and_descendant():
    dom = parse_html(HTML)
    assert dom.select_one("h1.title").get_text(strip=True) == "HelloWorld"
    assert dom.select_one("article .content") is not None
    assert dom.select_one("#content .comment .author").get_text(strip=True) == "kim"
    assert dom.select_one(".missing") is None
    assert len(dom.select(".comment")) == 2


def test_adjacent_sibling_and_attr():
    dom = parse_html(HTML)
    assert dom.select_one(".title_headtext + span").get_text(strip=True) == "after"
    assert dom.select_one("time[datetime]")["datetime"] == "2024-01-02T03:04:05Z"


def test_get_text_separator_strip():
    dom = parse_html(HTML)
    div = dom.select_one("article .content")
    # bs4 semantics: strip each string, drop empties, join by separator
    assert div.get_text(separator="\n", strip=True) == "one\ntwo"
    assert div.get_text(strip=True) == "onetwo"


def test_decompose_and_find_all():
    dom = parse_html(HTML)
    for el in dom.find_all(["script"]):
        el.decompose()
    assert "not text" not in dom.get_text()
    assert [e.tag for e in dom.find_all(class_=re.compile("comment"))]
    nodes = dom.find_all(string=re.compile("anon"))
    assert nodes and nodes[0].parent.classes == ["content"]


def test_child_combinator():
    dom = parse_html('<div class="a"><div class="b"><span class="c">x</span></div></div>')
    assert dom.select_one(".a > .b") is not None
    assert dom.select_one(".a > .c") is None  # c is a grandchild


def test_void_and_entities():
    dom = parse_html("<p>a&amp;b<br>c</p>")
    assert dom.select_one("p").get_text() == "a&bc"


def test_fast_tokenizer_equivalent_to_stdlib():
    """The regex tokenizer must build the identical DOM to html.parser for
    the corpus-shaped HTML (and fall back on anything it can't handle)."""
    from game_review_crawler_ray.functions.minidom import (
        parse_html_fast, parse_html_stdlib,
    )
    from game_review_crawler_ray.sources.corpus import gen_pages

    def dump(el):
        if hasattr(el, "text"):
            return ("T", el.text)
        return ("E", el.tag, tuple(sorted(el.attrs.items())),
                tuple(dump(c) for c in el.children))

    pages, _ = gen_pages(300, 16, 99)
    for h in pages.column("html").to_pylist():
        s = h.decode()
        assert dump(parse_html_fast(s)) == dump(parse_html_stdlib(s))
    for s in ['<p>a&amp;b<br>c</p>', '<div class="x" id=y bare>t</div>',
              "<script>if (a<b) {x='</div>'}</script><p>after</p>",
              '<!-- c --><b>x</b>', '<img src="u"/><span>z</span>',
              '<style>.a{c:red}</style><em>e</em>']:
        assert dump(parse_html_fast(s)) == dump(parse_html_stdlib(s))


def test_fast_tokenizer_fallback():
    # stray '<' falls back to the stdlib parser without error
    dom = parse_html("<p>a < b</p>")
    assert "a" in dom.get_text()
