"""ARIA link weighting / budget filtering (reference src/nav/links.ts)."""

from __future__ import annotations


def get_node_depth(node: dict, current_depth: int = 0) -> int:
    """reference src/nav/links.ts:12-21."""
    max_depth = current_depth
    for child in node.get("children") or ():
        max_depth = max(max_depth, get_node_depth(child, current_depth + 1))
    return max_depth


def count_links(node: dict) -> int:
    """reference src/nav/links.ts:26-34."""
    count = 1 if node["type"] == "link" else 0
    for child in node.get("children") or ():
        count += count_links(child)
    return count


_IMPORTANT_TYPES = frozenset(
    ["main", "article", "navigation", "heading", "link", "list"])


def calculate_node_weight(node: dict, depth: int = 0, index_in_parent: int = 0,
                          sibling_count: int = 1) -> float:
    """reference src/nav/links.ts:42-68."""
    depth_weight = 1 / (depth + 1)
    position_weight = ((sibling_count - index_in_parent) / sibling_count
                       if sibling_count > 1 else 1)
    link_count = count_links(node)
    child_count = len(node.get("children") or ())
    content_weight = link_count * 0.5 + child_count * 0.3
    type_weight = 1.5 if node["type"] in _IMPORTANT_TYPES else 1
    name_weight = 1.2 if node.get("name") else 0.8
    return (depth_weight * 3 + position_weight * 2 + content_weight
            + type_weight + name_weight) / 8


def assign_weights_to_tree(node: dict, depth: int = 0, index_in_parent: int = 0,
                           sibling_count: int = 1) -> dict:
    """reference src/nav/links.ts:73-94."""
    weighted = {**node,
                "weight": calculate_node_weight(
                    node, depth, index_in_parent, sibling_count)}
    children = node.get("children")
    if children:
        weighted["children"] = [
            assign_weights_to_tree(child, depth + 1, index, len(children))
            for index, child in enumerate(children)]
    return weighted


def filter_nodes_by_weight(node: dict, max_links: int,
                           link_counter: list | None = None) -> dict | None:
    """reference src/nav/links.ts:99-159 (greedy cut, weight-sorted)."""
    if link_counter is None:
        link_counter = [0]
    if link_counter[0] >= max_links:
        return None
    if node["type"] == "link":
        link_counter[0] += 1
    children = node.get("children")
    if children:
        sorted_children = sorted(
            children, key=lambda c: -(c.get("weight") or 0))
        filtered = []
        for child in sorted_children:
            if link_counter[0] >= max_links:
                break
            result = filter_nodes_by_weight(child, max_links, link_counter)
            if result:
                filtered.append(result)
        if filtered:
            return {**node, "children": filtered}
        result = {k: v for k, v in node.items() if k != "children"}
        return result
    return node
