"""HTML parser with htmlparser2 (v10, default options) semantics.

Brand-new implementation of the parse surface the reference relies on:
``parseHTML`` (reference src/parsers/htmlparser2.ts:18-132) builds a
VDocument from htmlparser2 events.  htmlparser2's quirks are part of
the byte-identity spec (SURVEY.md §7.4 item 2), so this module mirrors
its default-mode (non-XML) behavior:

Tokenizer level:
- rawtext special tags (script/style: no entity decoding) and RCDATA
  (title/textarea: entities decoded), terminated only by a matching
  ``</name`` followed by ``>`` or whitespace;
- entities decoded in text produce SEPARATE text events (one per code
  point), failed references merge into the surrounding literal run;
- ``<`` not followed by an ASCII letter / ``!`` / ``/`` / ``?`` is text;
- comments ``<!-- -->``, declarations ``<! >``, CDATA ``<![CDATA[ ]]>``
  and processing instructions ``<? >`` are consumed and dropped (the
  reference registers no handlers for them);
- ``/>`` is ignored on non-void elements outside foreign (svg/math)
  content — ``<div/>`` OPENS a div.

Parser level:
- ``openImpliesClose`` implicit-close map, void elements, the
  ``</p>``→creates-empty-``<p>`` and ``</br>``→``<br>`` resurrections,
  foreign-context (svg/math) self-closing support, and closing-tag
  stack unwinding that emits one close event per popped element.

Handler level (the reference's parseHTML):
- pre-created ``<html>``/``<body>`` elements; ``<html>``/``<body>``
  open tags merge attributes into them; body is attached to
  documentElement only when an explicit ``<body>`` appears (a fragment
  without ``<body>`` leaves doc.body EMPTY — load-bearing quirk);
- text events append one VText per event.
"""

from __future__ import annotations

from .entities import decode_attribute, decode_text_segments
from .vdom import VDocument, VElement, VText, create_element, text_cache_clear

VOID_ELEMENTS = frozenset([
    "area", "base", "basefont", "br", "col", "command", "embed", "frame",
    "hr", "img", "input", "isindex", "keygen", "link", "meta", "param",
    "source", "track", "wbr",
])

FOREIGN_CONTEXT_ELEMENTS = frozenset(["math", "svg"])
HTML_INTEGRATION_ELEMENTS = frozenset([
    "mi", "mo", "mn", "ms", "mtext", "annotation-xml", "foreignobject",
    "desc", "title",
])

_FORM_TAGS = frozenset(
    ["input", "option", "optgroup", "select", "button", "datalist", "textarea"])
_P_TAG = frozenset(["p"])

OPEN_IMPLIES_CLOSE: dict[str, frozenset] = {
    "tr": frozenset(["tr", "th", "td"]),
    "th": frozenset(["th"]),
    "td": frozenset(["thead", "th", "td"]),
    "body": frozenset(["head", "link", "script"]),
    "li": frozenset(["li"]),
    "p": _P_TAG,
    "h1": _P_TAG, "h2": _P_TAG, "h3": _P_TAG,
    "h4": _P_TAG, "h5": _P_TAG, "h6": _P_TAG,
    "select": _FORM_TAGS, "input": _FORM_TAGS, "output": _FORM_TAGS,
    "button": _FORM_TAGS, "datalist": _FORM_TAGS, "textarea": _FORM_TAGS,
    "option": frozenset(["option"]),
    "optgroup": frozenset(["optgroup", "option"]),
    "dd": frozenset(["dt", "dd"]),
    "dt": frozenset(["dt", "dd"]),
    "address": _P_TAG, "article": _P_TAG, "aside": _P_TAG,
    "blockquote": _P_TAG, "details": _P_TAG, "div": _P_TAG, "dl": _P_TAG,
    "fieldset": _P_TAG, "figcaption": _P_TAG, "figure": _P_TAG,
    "footer": _P_TAG, "form": _P_TAG, "header": _P_TAG, "hr": _P_TAG,
    "main": _P_TAG, "nav": _P_TAG, "ol": _P_TAG, "pre": _P_TAG,
    "section": _P_TAG, "table": _P_TAG, "ul": _P_TAG,
    "rt": frozenset(["rt", "rp"]),
    "rp": frozenset(["rt", "rp"]),
    "tbody": frozenset(["thead", "tbody"]),
    "tfoot": frozenset(["thead", "tbody"]),
}

_RAWTEXT = frozenset(["script", "style"])
_RCDATA = frozenset(["title", "textarea"])
_SPECIAL = _RAWTEXT | _RCDATA

_HTML_WS = "\t\n\x0c\r "  # htmlparser2 isWhitespace
_TAG_START_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


class _DocBuilder:
    """The reference's htmlparser2 handler (src/parsers/htmlparser2.ts:35-126)."""

    def __init__(self, base_uri: str = "about:blank"):
        self.doc = VDocument(
            create_element("html"), create_element("body"),
            base_uri=base_uri, document_uri=base_uri)
        self.doc.body.parent = self.doc.document_element
        self.current: VElement = self.doc.document_element
        self.body_found = False

    def onopentag(self, name: str, attrs: dict):
        doc = self.doc
        if name == "html":
            doc.document_element.attrs.update(attrs)
            self.current = doc.document_element
            return
        if name == "body":
            doc.body.attrs.update(attrs)
            if not self.body_found:
                doc.document_element.children.append(doc.body)
                self.body_found = True
            self.current = doc.body
            return
        element = VElement(name, attrs, parent=self.current)
        self.current.children.append(element)
        self.current = element

    def ontext(self, text: str):
        self.current.children.append(VText(text, parent=self.current))

    def onclosetag(self, name: str):
        if name == "html":
            self.current = self.doc.document_element
            return
        parent = self.current.parent
        if parent is not None:
            self.current = parent


class HtmlParser:
    """htmlparser2-equivalent Parser+Tokenizer over a complete input string."""

    def __init__(self, handler):
        self.h = handler
        self.stack: list[str] = []
        self.foreign: list[bool] = [False]
        self._lower = ""  # lowercased input, set once in parse()

    # ---- parser-level ops -------------------------------------------------

    def _emit_open(self, name: str, attrs: dict, self_closing: bool):
        implies = OPEN_IMPLIES_CLOSE.get(name)
        if implies:
            while self.stack and self.stack[-1] in implies:
                self.h.onclosetag(self.stack.pop())
        is_void = name in VOID_ELEMENTS
        if not is_void:
            self.stack.append(name)
            if name in FOREIGN_CONTEXT_ELEMENTS:
                self.foreign.append(True)
            elif self.foreign and self.foreign[-1] and name in HTML_INTEGRATION_ELEMENTS:
                self.foreign.append(False)
        self.h.onopentag(name, attrs)
        if is_void:
            self.h.onclosetag(name)
        elif self_closing and self.foreign and self.foreign[-1]:
            # closeCurrentTag: only pops when top of stack matches
            if self.stack and self.stack[-1] == name:
                self.stack.pop()
                self.h.onclosetag(name)

    def _emit_close(self, name: str):
        if name in FOREIGN_CONTEXT_ELEMENTS or name in HTML_INTEGRATION_ELEMENTS:
            if self.foreign:
                self.foreign.pop()
        if name not in VOID_ELEMENTS:
            pos = -1
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i] == name:
                    pos = i
                    break
            if pos != -1:
                while len(self.stack) > pos:
                    self.h.onclosetag(self.stack.pop())
            elif name == "p":
                # </p> with no open p: create an empty <p>
                self._emit_open("p", {}, False)
                if self.stack and self.stack[-1] == "p":
                    self.stack.pop()
                    self.h.onclosetag("p")
        elif name == "br":
            # </br> resurrects as <br>
            self._emit_open("br", {}, False)

    def _end(self):
        while self.stack:
            self.h.onclosetag(self.stack.pop())

    # ---- tokenizer --------------------------------------------------------

    def parse(self, html: str):
        h = self.h
        s = html
        self._lower = html.lower()
        n = len(s)
        pos = 0
        text_start = 0

        def flush_text(end: int):
            if end > text_start:
                for seg in decode_text_segments(s[text_start:end]):
                    h.ontext(seg)

        while pos < n:
            lt = s.find("<", pos)
            if lt == -1:
                break
            nxt = s[lt + 1] if lt + 1 < n else ""
            if nxt in _TAG_START_LETTERS:
                flush_text(lt)
                pos = self._parse_open_tag(s, lt + 1)
                text_start = pos
            elif nxt == "/":
                after = s[lt + 2] if lt + 2 < n else ""
                if after in _TAG_START_LETTERS:
                    flush_text(lt)
                    pos = self._parse_close_tag(s, lt + 2)
                    text_start = pos
                elif after == ">":
                    flush_text(lt)  # "</>" dropped entirely
                    pos = lt + 3
                    text_start = pos
                elif after == "":
                    pos = n  # trailing "</" is dropped with the tag state
                    flush_text(lt)
                    text_start = n
                else:
                    # bogus comment until '>'
                    flush_text(lt)
                    gt = s.find(">", lt + 2)
                    pos = n if gt == -1 else gt + 1
                    text_start = pos
            elif nxt == "!":
                flush_text(lt)
                pos = self._parse_markup_declaration(s, lt + 2)
                text_start = pos
            elif nxt == "?":
                flush_text(lt)
                gt = s.find(">", lt + 2)
                pos = n if gt == -1 else gt + 1
                text_start = pos
            else:
                # '<' is literal text; continue scanning after it
                pos = lt + 1
        flush_text(n)
        self._end()

    def _parse_markup_declaration(self, s: str, i: int) -> int:
        n = len(s)
        if s.startswith("--", i):
            end = s.find("-->", i + 2)
            return n if end == -1 else end + 3
        if s.startswith("[CDATA[", i):
            end = s.find("]]>", i + 7)
            return n if end == -1 else end + 3
        gt = s.find(">", i)
        return n if gt == -1 else gt + 1

    def _parse_close_tag(self, s: str, i: int) -> int:
        n = len(s)
        j = i
        while j < n and s[j] not in _HTML_WS and s[j] != "/" and s[j] != ">":
            j += 1
        name = s[i:j].lower()
        # skip to '>'
        gt = s.find(">", j)
        if gt == -1:
            return n  # unterminated close tag at EOF: dropped
        self._emit_close(name)
        return gt + 1

    def _parse_open_tag(self, s: str, i: int) -> int:
        n = len(s)
        j = i
        while j < n and s[j] not in _HTML_WS and s[j] != "/" and s[j] != ">":
            j += 1
        name = s[i:j].lower()
        attrs: dict[str, str] = {}
        pos = j
        self_closing = False
        closed = False
        while pos < n:
            c = s[pos]
            if c in _HTML_WS:
                pos += 1
                continue
            if c == "/":
                # self-closing only when immediately followed by '>'
                if pos + 1 < n and s[pos + 1] == ">":
                    self_closing = True
                    closed = True
                    pos += 2
                    break
                pos += 1
                continue
            if c == ">":
                closed = True
                pos += 1
                break
            # attribute name
            a = pos
            while pos < n and s[pos] not in _HTML_WS and s[pos] not in "=/>":
                pos += 1
            attr_name = s[a:pos].lower()
            # afterAttributeName: skip whitespace
            while pos < n and s[pos] in _HTML_WS:
                pos += 1
            value = ""
            if pos < n and s[pos] == "=":
                pos += 1
                while pos < n and s[pos] in _HTML_WS:
                    pos += 1
                if pos < n and s[pos] in "\"'":
                    quote = s[pos]
                    pos += 1
                    end = s.find(quote, pos)
                    if end == -1:
                        value = decode_attribute(s[pos:])
                        pos = n
                    else:
                        value = decode_attribute(s[pos:end])
                        pos = end + 1
                else:
                    v = pos
                    while pos < n and s[pos] not in _HTML_WS and s[pos] != ">":
                        pos += 1
                    value = decode_attribute(s[v:pos])
            if attr_name and attr_name not in attrs:
                attrs[attr_name] = value
        if not closed:
            return n  # unterminated open tag at EOF: dropped entirely
        is_special = (not self_closing) and name in _SPECIAL
        self._emit_open(name, attrs, self_closing)
        if is_special:
            return self._parse_special_content(s, pos, name)
        return pos

    def _parse_special_content(self, s: str, i: int, name: str) -> int:
        """Raw/RCDATA content until ``</name`` followed by '>' or whitespace."""
        n = len(s)
        needle = "</" + name
        search = self._lower
        pos = i
        while True:
            idx = search.find(needle, pos)
            if idx == -1:
                # EOF inside special tag: remaining emitted as text
                self._emit_special_text(s[i:], name)
                return n
            after = s[idx + len(needle)] if idx + len(needle) < n else ">"
            if after == ">" or after in _HTML_WS:
                break
            pos = idx + 1
        self._emit_special_text(s[i:idx], name)
        # parse the closing tag normally (handles "</script foo >")
        return self._parse_close_tag(s, idx + 2)

    def _emit_special_text(self, text: str, name: str):
        if not text:
            return
        if name in _RCDATA:
            for seg in decode_text_segments(text):
                self.h.ontext(seg)
        else:
            self.h.ontext(text)


def parse_html(html: str, base_uri: str = "about:blank") -> VDocument:
    """reference src/parsers/htmlparser2.ts:18-132."""
    text_cache_clear()
    builder = _DocBuilder(base_uri)
    HtmlParser(builder).parse(html)
    return builder.doc


# List of self-closing tags for serialization
# (reference src/parsers/htmlparser2.ts:148-163)
_SELF_CLOSING = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
])


def serialize_to_html(node) -> str:
    """VDOM → raw HTML string (reference src/parsers/htmlparser2.ts:140-181).

    Note the reference's attribute "escaping" is the literal identity
    replace ``value.replace(/"/g, '"')`` — values are emitted verbatim.
    """
    if node.nodeType == 1:  # text
        return node.text
    tag = node.tag
    attributes = " ".join(f'{k}="{v}"' for k, v in node.attrs.items())
    attr_string = f" {attributes}" if attributes else ""
    if tag in _SELF_CLOSING and not node.children:
        return f"<{tag}{attr_string}/>"
    children_html = "".join(serialize_to_html(c) for c in node.children)
    return f"<{tag}{attr_string}>{children_html}</{tag}>"
