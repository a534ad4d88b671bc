"""Serialize this engine's parsed VDocument to the JSON the node oracle
driver (driver.mjs) rebuilds into reference-shape VDOM objects.

Node encoding (compact keys, one object per node):
    element: {"t": tag, "a": {attr: value} | omitted, "c": [children]}
    text:    {"x": textContent}

Document encoding:
    {"root": <element>,                 # documentElement tree
     "body_path": [i, j, ...] | None,   # child-index path from root to
                                        # body; None when body is NOT a
                                        # descendant (fragment-without-
                                        # body quirk, SURVEY.md §7.4)
     "body": <element> | omitted,       # the detached body tree, only
                                        # when body_path is None
     "base_uri": str | None,
     "document_uri": str | None}
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from readability_ray.vdom import ELEMENT, VDocument, VElement, VText  # noqa: E402


def node_to_json(node) -> dict:
    if node.nodeType == ELEMENT:
        out = {"t": node.tag, "c": [node_to_json(ch) for ch in node.children]}
        if node.attrs:
            out["a"] = dict(node.attrs)
        return out
    return {"x": node.text}


def _path_to(root: VElement, target: VElement) -> list[int] | None:
    """Child-index path root→target by identity, or None if detached."""
    # walk up from target collecting parents, verify chain reaches root
    chain = []
    node = target
    while node is not None and node is not root:
        parent = getattr(node, "parent", None)
        if parent is None:
            return None
        try:
            idx = next(i for i, ch in enumerate(parent.children)
                       if ch is node)
        except StopIteration:
            return None
        chain.append(idx)
        node = parent
    if node is not root:
        return None
    return list(reversed(chain))


def document_to_json(doc: VDocument) -> dict:
    body_path = _path_to(doc.document_element, doc.body)
    out = {
        "root": node_to_json(doc.document_element),
        "body_path": body_path,
        "base_uri": doc.base_uri,
        "document_uri": doc.document_uri,
    }
    if body_path is None:
        out["body"] = node_to_json(doc.body)
    return out
