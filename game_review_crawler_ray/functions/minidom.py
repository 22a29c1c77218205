"""A minimal HTML DOM with a CSS-selector subset (stdlib-only).

The reference parsers use BeautifulSoup+lxml (``crawler/parsers/generic.py:80``
et al.); neither library exists in this environment, so extraction is
rebuilt on ``html.parser`` with exactly the operations the reference relies
on:

- ``select_one`` / ``select`` with compound selectors (``tag``, ``.class``,
  ``#id``, ``tag.class``, ``tag[attr]``) and descendant / child (``>``) /
  adjacent-sibling (``+``) combinators — covers every selector string used
  by the four reference parsers.
- ``find`` / ``find_all`` by tag name(s), class regex, or text regex.
- ``get_text(separator, strip)`` with BeautifulSoup semantics: join all
  descendant text nodes in document order; when ``strip=True`` each string
  is stripped and empty strings are skipped.
- ``decompose`` (detach a subtree), attribute access.

The corpus HTML is generated well-formed (sources/corpus.py), so the
error-recovery differences between lxml and html.parser never trigger.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# script/style contents are raw text (CDATA-ish)
RAWTEXT_ELEMENTS = {"script", "style"}


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Element | None"):
        self.text = text
        self.parent = parent


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_index", "_classes")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element | TextNode] = []
        self.parent = parent
        self._index = None  # document-order class/tag index (root only, lazy)
        self._classes = None  # lazy split of the class attribute (immutable)

    # -- attribute helpers -------------------------------------------------
    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def __getitem__(self, name: str) -> str:
        return self.attrs[name]

    @property
    def classes(self) -> list[str]:
        # attrs never mutate after parse, so the split is cached (hot:
        # every class-selector match reads it)
        c = self._classes
        if c is None:
            c = self._classes = self.attrs.get("class", "").split()
        return c

    # -- traversal ---------------------------------------------------------
    def iter_elements(self) -> Iterator["Element"]:
        """All descendant elements in document order (excluding self)."""
        for child in self.children:
            if type(child) is Element:
                yield child
                yield from child.iter_elements()

    def iter_text_nodes(self) -> Iterator[TextNode]:
        for child in self.children:
            if type(child) is TextNode:
                yield child
            else:
                yield from child.iter_text_nodes()

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def previous_element_sibling(self) -> Optional["Element"]:
        if self.parent is None:
            return None
        prev = None
        for child in self.parent.children:
            if child is self:
                return prev
            if isinstance(child, Element):
                prev = child
        return None

    # -- text --------------------------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts = []
        for node in self.iter_text_nodes():
            s = node.text
            if strip:
                s = s.strip()
                if not s:
                    continue
            parts.append(s)
        return separator.join(parts)

    # -- mutation ----------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    # -- queries -----------------------------------------------------------
    def _candidates(self, subject: "_Simple"):
        """Document-order candidate elements for the selector subject.

        The root element keeps a lazy class/tag index (built on first query);
        candidates may have been decomposed since, so callers re-verify
        attachment. Non-root scopes fall back to a subtree scan.
        """
        if self.parent is not None or self.tag != "[document]":
            return self.iter_elements(), False
        by_class, by_tag = self._ensure_index()
        if subject.classes:
            return by_class.get(subject.classes[0], ()), True
        if subject.tag is not None:
            return by_tag.get(subject.tag, ()), True
        return self.iter_elements(), False

    def _ensure_index(self):
        """Lazy document-order class/tag index (root element only)."""
        if self._index is None:
            by_class: dict[str, list[Element]] = {}
            by_tag: dict[str, list[Element]] = {}
            for el in self.iter_elements():
                for c in el.classes:
                    by_class.setdefault(c, []).append(el)
                by_tag.setdefault(el.tag, []).append(el)
            self._index = (by_class, by_tag)
        return self._index

    def _attached(self, el: "Element") -> bool:
        node = el
        while node.parent is not None:
            node = node.parent
        return node is self

    def select(self, selector: str) -> list["Element"]:
        compiled = _parse_selector(selector)
        cands, check = self._candidates(compiled[-1][1])
        return [el for el in cands
                if (not check or self._attached(el))
                and _matches_chain(el, compiled, scope=self)]

    def select_one(self, selector: str) -> Optional["Element"]:
        compiled = _parse_selector(selector)
        cands, check = self._candidates(compiled[-1][1])
        for el in cands:
            if (not check or self._attached(el)) and _matches_chain(el, compiled, scope=self):
                return el
        return None

    def find(self, tag: str) -> Optional["Element"]:
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    def find_all(
        self,
        tags: str | list[str] | None = None,
        class_: "re.Pattern | str | None" = None,
        string: "re.Pattern | None" = None,
    ):
        """Subset of bs4 find_all used by the reference parsers.

        - ``tags``: tag name or list of tag names.
        - ``class_``: regex matched against each individual class value.
        - ``string``: regex over text nodes; returns the TextNodes.
        """
        if string is not None:
            return [t for t in self.iter_text_nodes() if string.search(t.text)]
        if isinstance(tags, str):
            tags = [tags]
        # root scope + tag filter: serve candidates from the lazy tag index
        # (document order preserved; decomposed nodes re-verified)
        if (tags is not None and self.parent is None
                and self.tag == "[document]"):
            _, by_tag = self._ensure_index()
            cands = [el for t in tags for el in by_tag.get(t, ())]
            if len(tags) > 1:  # restore document order across tag lists
                order = {el: i for i, el in enumerate(self.iter_elements())}
                cands.sort(key=lambda el: order.get(el, 1 << 30))
            out = []
            for el in cands:
                if not self._attached(el):
                    continue
                if class_ is not None:
                    if isinstance(class_, str):
                        if class_ not in el.classes:
                            continue
                    else:
                        if not any(class_.search(c) for c in el.classes):
                            continue
                out.append(el)
            return out
        out = []
        for el in self.iter_elements():
            if tags is not None and el.tag not in tags:
                continue
            if class_ is not None:
                if isinstance(class_, str):
                    if class_ not in el.classes:
                        continue
                else:
                    if not any(class_.search(c) for c in el.classes):
                        continue
            out.append(el)
        return out

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<{self.tag} {self.attrs}>"


# ---------------------------------------------------------------------------
# Selector machinery
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[\w-]+\])*)$"
)
_PART_RE = re.compile(r"([.#])([\w-]+)|\[([\w-]+)\]")


class _Simple:
    __slots__ = ("tag", "ids", "classes", "attrs")

    def __init__(self, token: str):
        m = _SIMPLE_RE.match(token)
        if not m:
            raise ValueError(f"unsupported selector token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.ids: list[str] = []
        self.classes: list[str] = []
        self.attrs: list[str] = []
        for pm in _PART_RE.finditer(m.group("rest") or ""):
            if pm.group(1) == ".":
                self.classes.append(pm.group(2))
            elif pm.group(1) == "#":
                self.ids.append(pm.group(2))
            else:
                self.attrs.append(pm.group(3))

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        if self.ids and el.attrs.get("id") not in self.ids:
            return False
        el_classes = el.classes
        for c in self.classes:
            if c not in el_classes:
                return False
        for a in self.attrs:
            if a not in el.attrs:
                return False
        return True


import functools


@functools.lru_cache(maxsize=512)
def _parse_selector(selector: str):
    """Parse into [(combinator, _Simple), ...] right-to-left.

    combinator is one of "" (rightmost), " " (descendant), ">" (child),
    "+" (adjacent sibling).
    """
    tokens = selector.replace(">", " > ").replace("+", " + ").split()
    chain: list[tuple[str, _Simple]] = []
    combinator = ""
    pending = " "
    for tok in tokens:
        if tok in (">", "+"):
            pending = tok
            continue
        chain.append((pending, _Simple(tok)))
        pending = " "
    # chain[i] = (combinator linking chain[i-1] -> chain[i], simple);
    # the subject of the selector is the last entry.
    return chain


def _matches_chain(el: Element, chain, scope: Element) -> bool:
    """Match el against a parsed selector chain (subject = last entry)."""
    idx = len(chain) - 1
    _, subject = chain[idx]
    if not subject.matches(el):
        return False
    return _match_rest(el, chain, idx, scope)


def _match_rest(el: Element, chain, idx: int, scope: Element) -> bool:
    if idx == 0:
        return True
    comb, _ = chain[idx]  # combinator between chain[idx-1] and chain[idx]
    _, left = chain[idx - 1]
    if comb == " ":
        anc = el.parent
        while anc is not None and anc is not scope.parent:
            if isinstance(anc, Element) and left.matches(anc):
                if _match_rest(anc, chain, idx - 1, scope):
                    return True
            anc = anc.parent
        return False
    if comb == ">":
        p = el.parent
        if p is not None and isinstance(p, Element) and left.matches(p):
            return _match_rest(p, chain, idx - 1, scope)
        return False
    if comb == "+":
        sib = el.previous_element_sibling()
        if sib is not None and left.matches(sib):
            return _match_rest(sib, chain, idx - 1, scope)
        return False
    raise ValueError(f"unsupported combinator: {comb!r}")


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {}, None)
        self.stack: list[Element] = [self.root]
        self._rawtext_tag: str | None = None

    def handle_starttag(self, tag, attrs):
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag in VOID_ELEMENTS:
            return
        self.stack.append(el)
        if tag in RAWTEXT_ELEMENTS:
            self._rawtext_tag = tag

    def handle_startendtag(self, tag, attrs):
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict, self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        # pop until matching tag (tolerates mild mis-nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break
        if self._rawtext_tag == tag:
            self._rawtext_tag = None

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))


def parse_html_stdlib(html: str) -> Element:
    """Parse via html.parser (reference tokenizer, slower)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ---------------------------------------------------------------------------
# Fast tokenizer: a regex scanner for the well-formed-HTML common case.
# Equivalence-tested against parse_html_stdlib over the generated corpus and
# randomized documents; any structural surprise falls back to the stdlib
# parser for the whole document.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"<(?:(!--)|(!)|(/))?\s*([a-zA-Z][a-zA-Z0-9-]*)?", re.S)
_ATTR_RE = re.compile(
    r"""\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*("([^"]*)"|'([^']*)'|[^\s>]+))?"""
)
_HAS_ENTITY_RE = re.compile(r"&")


def _unescape(text: str) -> str:
    if "&" in text:
        import html as _html

        return _html.unescape(text)
    return text


def parse_html_fast(html: str) -> Element:
    root = Element("[document]", {}, None)
    stack = [root]
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            if i < n:
                top = stack[-1]
                top.children.append(TextNode(_unescape(html[i:]), top))
            break
        if lt > i:
            top = stack[-1]
            top.children.append(TextNode(_unescape(html[i:lt]), top))
        m = _TOKEN_RE.match(html, lt)
        if m is None:
            raise ValueError("unparseable tag")
        comment, bang, closing, name = m.groups()
        if comment:
            end = html.find("-->", lt + 4)
            if end < 0:
                break
            i = end + 3
            continue
        if bang:  # doctype / CDATA-ish: skip to '>'
            end = html.find(">", lt)
            if end < 0:
                break
            i = end + 1
            continue
        if name is None:
            # a bare '<' in text (html.parser treats it as data up to the
            # next tag in ways we don't replicate) -> fall back
            raise ValueError("stray <")
        name = name.lower()
        if closing:
            end = html.find(">", m.end())
            if end < 0:
                break
            if name not in VOID_ELEMENTS:
                for j in range(len(stack) - 1, 0, -1):
                    if stack[j].tag == name:
                        del stack[j:]
                        break
            i = end + 1
            continue
        # start tag: scan attributes
        attrs: dict[str, str] = {}
        pos = m.end()
        while True:
            am = _ATTR_RE.match(html, pos)
            if am is None:
                break
            key = am.group(1).lower()
            if am.group(3) is not None:
                val = am.group(3)
            elif am.group(4) is not None:
                val = am.group(4)
            elif am.group(2) is not None:
                val = am.group(2)
            else:
                val = ""
            if key not in attrs:
                attrs[key] = _unescape(val)
            pos = am.end()
        gt = html.find(">", pos)
        if gt < 0:
            break
        self_closing = html[gt - 1] == "/"
        el = Element(name, attrs, stack[-1])
        stack[-1].children.append(el)
        i = gt + 1
        if self_closing or name in VOID_ELEMENTS:
            continue
        if name in RAWTEXT_ELEMENTS:
            close = html.lower().find(f"</{name}", i)
            if close < 0:
                raw = html[i:]
                i = n
            else:
                raw = html[i:close]
                end_gt = html.find(">", close)
                i = (end_gt + 1) if end_gt >= 0 else n
            if raw:
                el.children.append(TextNode(raw, el))
            continue
        stack.append(el)
    return root


def parse_html(html: str) -> Element:
    """Parse an HTML string into a document root Element (fast tokenizer
    with stdlib fallback)."""
    try:
        return parse_html_fast(html)
    except Exception:
        return parse_html_stdlib(html)
