"""Virtual DOM node model + tree utilities.

Re-derivation of the reference's VNode model (reference src/types.ts:10-45)
and DOM helpers (reference src/dom.ts) with identical observable
semantics.  The tree is transient per-row state inside a Ray Data
``map_batches`` UDF — it never crosses a block boundary (SURVEY.md §1.3).

Python notes vs the TS original:
- ``parent`` is a plain reference, not a WeakRef: within one extract call
  nothing is collected, so behavior is equivalent (SURVEY.md §7.4 item 5).
- ``id`` / ``class_name`` mirror the TS "convenient accessors", which are
  set only when the attribute is truthy (reference src/parsers/
  htmlparser2.ts:45-46,83-84): here they are properties returning None
  for missing/empty attributes.
"""

from __future__ import annotations

import sys

from .jsstr import js_len, js_normalize_spaces, js_trim


def ensure_recursion_headroom(limit: int = 30000) -> None:
    """Deep real-world DOMs (1000s of nested wrappers) exceed CPython's
    default recursion limit in the recursive tree walks; entrypoints
    call this once.  The Ray extraction actor additionally wraps each
    row in try/except so a pathological page degrades to an ``error``
    column, never a crash."""
    if sys.getrecursionlimit() < limit:
        sys.setrecursionlimit(limit)

ELEMENT = 0
TEXT = 1


class VText:
    __slots__ = ("text", "parent")
    nodeType = TEXT

    def __init__(self, text: str, parent: "VElement | None" = None):
        self.text = text
        self.parent = parent

    def __repr__(self):  # pragma: no cover - debug aid
        return f"VText({self.text!r})"


class VElement:
    __slots__ = ("tag", "attrs", "children", "parent", "score",
                 "_text_raw", "_text_norm", "_tags")
    nodeType = ELEMENT

    def __init__(self, tag: str, attrs: dict | None = None,
                 parent: "VElement | None" = None):
        self.tag = tag.lower()
        self.attrs = attrs if attrs is not None else {}
        self.children: list = []
        self.parent = parent
        # readability.contentScore annotation; None == "not initialized"
        # (reference src/types.ts:15-17)
        self.score: float | None = None
        # per-node memo slots for inner-text / tag scans; they live and
        # die with the node (an id()-keyed module dict can collide
        # after GC recycles addresses)
        self._text_raw: str | None = None
        self._text_norm: str | None = None
        self._tags: dict | None = None

    @property
    def id(self) -> str | None:
        """TS ``element.id`` accessor — set only when truthy."""
        return self.attrs.get("id") or None

    @property
    def class_name(self) -> str | None:
        """TS ``element.className`` accessor — set only when truthy."""
        return self.attrs.get("class") or None

    def __repr__(self):  # pragma: no cover - debug aid
        return f"VElement(<{self.tag}> {len(self.children)} children)"


class VDocument:
    __slots__ = ("document_element", "body", "base_uri", "document_uri")

    def __init__(self, document_element: VElement, body: VElement,
                 base_uri: str | None = None, document_uri: str | None = None):
        self.document_element = document_element
        self.body = body
        self.base_uri = base_uri
        self.document_uri = document_uri


def create_element(tag: str) -> VElement:
    """reference src/dom.ts:19-26."""
    return VElement(tag)


def create_text_node(content: str) -> VText:
    """reference src/dom.ts:28-33."""
    return VText(content)


def get_attribute(element: VElement, name: str) -> str | None:
    """reference src/dom.ts:36-38 (``|| null`` — empty string → None)."""
    return element.attrs.get(name) or None


def get_elements_by_tag_name(element: VElement, tag_name) -> list[VElement]:
    """Pre-order collection including self (reference src/dom.ts:41-59).

    Iterative (explicit stack) so multi-thousand-deep real-world pages
    don't hit Python's recursion limit.  Results memoize on the node
    (the DOM is static outside preprocessing, which invalidates).
    """
    if isinstance(tag_name, str):
        tags = (tag_name.lower(),)
    else:
        tags = tuple(t.lower() for t in tag_name)
    node_cache = element._tags
    if node_cache is None:
        node_cache = element._tags = {}
    cached = node_cache.get(tags)
    if cached is not None:
        return cached  # callers never mutate the returned list
    match_all = "*" in tags
    result: list[VElement] = []
    stack = [element]
    if match_all:
        while stack:
            node = stack.pop()
            result.append(node)
            for child in reversed(node.children):
                if child.nodeType == ELEMENT:
                    stack.append(child)
    elif len(tags) == 1:
        tag = tags[0]
        while stack:
            node = stack.pop()
            if node.tag == tag:
                result.append(node)
            for child in reversed(node.children):
                if child.nodeType == ELEMENT:
                    stack.append(child)
    else:
        while stack:
            node = stack.pop()
            if node.tag in tags:
                result.append(node)
            for child in reversed(node.children):
                if child.nodeType == ELEMENT:
                    stack.append(child)
    node_cache[tags] = result
    return result


def get_next_node(node, ignore_self_and_kids: bool = False):
    """Depth-first successor (reference src/dom.ts:62-84)."""
    if node.nodeType == ELEMENT and not ignore_self_and_kids and node.children:
        return node.children[0]
    parent = node.parent
    siblings = parent.children if parent is not None else []
    try:
        index = siblings.index(node)
    except ValueError:
        index = -1
    if index != -1 and index < len(siblings) - 1:
        return siblings[index + 1]
    if parent is not None:
        return get_next_node(parent, True)
    return None


def is_probably_visible(node: VElement) -> bool:
    """reference src/dom.ts:87-98."""
    style = node.attrs.get("style", "")
    return (
        "display: none" not in style
        and "visibility: hidden" not in style
        and "hidden" not in node.attrs
        and node.attrs.get("aria-hidden") != "true"
    )


def has_ancestor_tag(node, tag_name: str, max_depth: int = -1) -> bool:
    """reference src/dom.ts:125-151 (note: allows max_depth+1 ancestors —
    the depth check is ``depth > maxDepth`` after visiting)."""
    tag_name = tag_name.lower()
    depth = 0
    current = node.parent
    while current is not None:
        if max_depth > 0 and depth > max_depth:
            return False
        if current.tag == tag_name:
            return True
        current = current.parent
        depth += 1
    return False


# DIV_TO_P_ELEMS (reference src/constants.ts:37-47)
DIV_TO_P_ELEMS = frozenset(
    ["blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul"])

# PHRASING_ELEMS (reference src/constants.ts:50-91)
PHRASING_ELEMS = frozenset([
    "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
    "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
    "mark", "math", "meter", "noscript", "object", "output", "progress",
    "q", "ruby", "samp", "script", "select", "small", "span", "strong",
    "sub", "sup", "textarea", "time", "var", "wbr",
])


def has_child_block_element(element: VElement) -> bool:
    """reference src/dom.ts:154-162."""
    for child in element.children:
        if child.nodeType != ELEMENT:
            continue
        if child.tag in DIV_TO_P_ELEMS or has_child_block_element(child):
            return True
    return False


def is_phrasing_content(node) -> bool:
    """reference src/dom.ts:165-184."""
    if node.nodeType == TEXT:
        return True
    if node.tag in PHRASING_ELEMS:
        return True
    if node.tag in ("a", "del", "ins"):
        return all(is_phrasing_content(c) for c in node.children)
    return False


def _raw_inner_text(element) -> str:
    """The element branch of getInnerText before trim: concatenates direct
    text children raw and element children via getInnerText(child, false)
    — i.e. each nested element's text is trimmed at its own level
    (reference src/dom.ts:187-209, a load-bearing quirk)."""
    if element.nodeType == TEXT:
        return element.text
    parts = []
    for child in element.children:
        if child.nodeType == TEXT:
            parts.append(child.text)
        else:
            parts.append(get_inner_text(child, False))
    return "".join(parts)


def text_cache_clear(root=None) -> None:
    """Invalidate per-node memo caches.

    With no argument this is a no-op retained for API stability (the
    caches live on the nodes now and die with them); pass a subtree
    root to invalidate after mutating the tree."""
    if root is None:
        return
    stack = [root]
    while stack:
        node = stack.pop()
        if node.nodeType == ELEMENT:
            node._text_raw = None
            node._text_norm = None
            node._tags = None
            stack.extend(node.children)


def get_inner_text(element, normalize_spaces: bool = True) -> str:
    """reference src/dom.ts:187-209 (memoized on the node)."""
    if element.nodeType == TEXT:
        text = js_trim(element.text)
        return js_normalize_spaces(text) if normalize_spaces else text
    if normalize_spaces:
        cached = element._text_norm
        if cached is not None:
            return cached
        text = js_normalize_spaces(js_trim(_raw_inner_text(element)))
        element._text_norm = text
        return text
    cached = element._text_raw
    if cached is not None:
        return cached
    text = js_trim(_raw_inner_text(element))
    element._text_raw = text
    return text


def get_link_density(element: VElement) -> float:
    """reference src/dom.ts:212-228 (lengths are UTF-16 code units)."""
    text_length = js_len(get_inner_text(element))
    if text_length == 0:
        return 0.0
    link_length = 0.0
    for link in get_elements_by_tag_name(element, "a"):
        href = get_attribute(link, "href")
        coefficient = 0.3 if href and href.startswith("#") else 1.0
        link_length += js_len(get_inner_text(link)) * coefficient
    return link_length / text_length


def get_text_density(element: VElement) -> float:
    """reference src/dom.ts:231-238."""
    text_length = js_len(get_inner_text(element))
    if text_length == 0:
        return 0.0
    n_child_elements = sum(1 for c in element.children if c.nodeType == ELEMENT)
    return text_length / (n_child_elements or 1)


def get_node_ancestors(node: VElement, max_depth: int = 3) -> list[VElement]:
    """reference src/dom.ts:241-255."""
    ancestors = []
    current = node.parent
    depth = 0
    while current is not None and (max_depth <= 0 or depth < max_depth):
        ancestors.append(current)
        current = current.parent
        depth += 1
    return ancestors
