"""Test helpers: terse VDOM construction mirroring the reference's
hand-built VElement literals in its unit tests."""

from readability_ray.vdom import VElement, VText


def el(tag: str, attrs: dict | None = None, children: list | None = None) -> VElement:
    node = VElement(tag, dict(attrs or {}))
    for child in children or []:
        if isinstance(child, str):
            child = VText(child)
        child.parent = node
        node.children.append(child)
    return node


def tx(text: str) -> VText:
    return VText(text)
