"""ARIA tree build / compression / readable rendering
(reference src/nav/readableAria.ts).

AriaNodes are dicts (see aria.py); TS object-spread becomes ``{**node}``
and ``delete node.children`` becomes ``pop("children", None)``.
"""

from __future__ import annotations

from .aria import build_aria_node, count_aria_nodes
from .jsstr import js_num_to_str, js_trim
from .nav_links import assign_weights_to_tree, count_links, filter_nodes_by_weight
from .vdom import VDocument

_SIGNIFICANT_ROOT_TYPES = (
    "main", "article", "section", "navigation", "banner", "contentinfo")


def build_aria_tree(doc: VDocument, compress: bool = True) -> dict:
    """reference src/nav/readableAria.ts:23-78.  Returns
    ``{"root": node, "nodeCount": n}``."""
    root_node = build_aria_node(doc.body)
    result_root = root_node
    if compress:
        result_root = _to_compact(root_node)
        # root-level unwrapping
        children = result_root.get("children")
        if result_root["type"] == "text" and children:
            significant = next(
                (c for c in children if c["type"] in _SIGNIFICANT_ROOT_TYPES),
                None)
            if significant is not None:
                if result_root.get("name") and not significant.get("name"):
                    significant["name"] = result_root["name"]
                result_root = significant
            elif len(children) == 1:
                child = children[0]
                if child.get("name"):
                    result_root["name"] = (
                        f"{result_root['name']} {child['name']}"
                        if result_root.get("name") else child["name"])
                if child.get("children"):
                    result_root["children"] = child["children"]
                else:
                    result_root.pop("children", None)
    return {"root": result_root, "nodeCount": count_aria_nodes(result_root)}


def _is_insignificant(node: dict) -> bool:
    """reference src/nav/readableAria.ts:83-86."""
    return (not node.get("name") and node["type"] == "generic"
            and not node.get("children"))


def _is_empty_text(node: dict) -> bool:
    name = node.get("name")
    return node["type"] == "text" and (not name or js_trim(name) == "")


def _to_compact(node: dict) -> dict:
    """Lossy tree compaction (reference src/nav/readableAria.ts:81-326)."""
    children = node.get("children")
    if not children:
        if _is_empty_text(node):
            return {"type": "generic", "role": "generic", "el": node.get("el")}
        return node

    processed = [_to_compact(c) for c in children]
    processed = [c for c in processed
                 if not _is_insignificant(c) and not _is_empty_text(c)]

    # special case: text node containing exactly one significant node
    if node["type"] == "text" and len(processed) == 1:
        child = processed[0]
        if child["type"] in _SIGNIFICANT_ROOT_TYPES:
            if node.get("name") and not child.get("name"):
                child["name"] = node["name"]
            return child

    # text whose children are all generic: lift grandchildren
    if (node["type"] == "text" and processed
            and all(c["type"] == "generic" for c in processed)):
        new_children: list = []
        for child in processed:
            if child.get("children"):
                new_children.extend(child["children"])
        if new_children:
            return {**node, "children": new_children}

    # single child: merge into parent when parent is nameless generic or
    # same type
    if len(processed) == 1:
        child = processed[0]
        if (node["type"] == "generic" and not node.get("name")) \
                or node["type"] == child["type"]:
            if node.get("name") and not child.get("name"):
                child["name"] = node["name"]
            elif node.get("name") and child.get("name"):
                child["name"] = f"{node['name']} {child['name']}"
            return child

    is_significant_node = node["type"] in (
        "main", "article", "section", "navigation", "banner", "contentinfo",
        "region", "form", "search")

    # all-generic children (or significant parent with some generic):
    # lift generic children's children
    if processed and (
            all(c["type"] == "generic" for c in processed)
            or (is_significant_node
                and any(c["type"] == "generic" for c in processed))):
        new_children = []
        for child in processed:
            if child["type"] == "generic":
                if child.get("children"):
                    new_children.extend(child["children"])
            else:
                new_children.append(child)
        if new_children:
            return {**node, "children": new_children}

    # merge consecutive same-type nodes; group article/section/listitem/img
    merged: list[dict] = []
    current_group: dict | None = None
    group_by_type: dict[str, list[dict]] = {}

    for child in processed:
        if child["type"] in ("article", "section", "listitem", "img"):
            group_by_type.setdefault(child["type"], []).append(child)
            continue
        if current_group is None or current_group["type"] != child["type"]:
            current_group = {**child}
            merged.append(current_group)
            continue
        if child.get("name"):
            current_group["name"] = (
                f"{current_group['name']} {child['name']}"
                if current_group.get("name") else child["name"])
        if child.get("children"):
            current_group.setdefault("children", []).extend(child["children"])

    for type_name, group in group_by_type.items():
        if len(group) > 1:
            merged.append({
                "type": type_name, "role": type_name,
                "el": node.get("el"), "children": group,
            })
        elif len(group) == 1:
            merged.append(group[0])

    # collapse nesting
    i = 0
    while i < len(merged):
        child = merged[i]
        grandchildren = child.get("children")
        if grandchildren and len(grandchildren) == 1:
            grandchild = grandchildren[0]
            if (child["type"] == grandchild["type"]
                    or (child["type"] == "text"
                        and grandchild["type"] in ("main", "article", "section"))):
                if grandchild.get("name"):
                    child["name"] = (
                        f"{child['name']} {grandchild['name']}"
                        if child.get("name") else grandchild["name"])
                if grandchild.get("children"):
                    child["children"] = grandchild["children"]
                    continue  # i-- in JS: reprocess this index
                else:
                    child.pop("children", None)
        child_list = child.get("children")
        if child_list and len(child_list) > 1:
            same_type = [c for c in child_list if c["type"] == child["type"]]
            if same_type:
                other = [c for c in child_list if c["type"] != child["type"]]
                new_children = []
                for same_child in same_type:
                    if same_child.get("name"):
                        child["name"] = (
                            f"{child['name']} {same_child['name']}"
                            if child.get("name") else same_child["name"])
                    if same_child.get("children"):
                        new_children.extend(same_child["children"])
                new_children.extend(other)
                child["children"] = new_children
                continue  # i-- in JS
        i += 1

    result = {**node}
    if merged:
        result["children"] = merged
    else:
        result.pop("children", None)
    return result


def compress_aria_tree(node: dict) -> dict:
    return _to_compact(node)


def _format_bool(value: bool) -> str:
    return "true" if value else "false"


def _node_to_string(node: dict, indent: int = 0) -> str:
    """reference src/nav/readableAria.ts:569-723 (ariaTreeToString body;
    toReadableAriaTree carries an identical copy)."""
    indent_str = "  " * indent
    name = node.get("name")
    children = node.get("children")
    node_type = node["type"]

    if ((not name and not children and node_type == "generic")
            or name == ""
            or (node_type == "list"
                and (not children
                     or all(not c.get("name") and not c.get("children")
                            for c in children)))):
        return ""

    result = f"{indent_str}- {node_type}"

    href = src = alt = ""
    element = node.get("el")
    if element is not None:
        if node_type == "link":
            href = element.attrs.get("href", "")
        elif node_type == "img":
            src = element.attrs.get("src", "")
            alt = element.attrs.get("alt", "")

    if name:
        if name.startswith("/") and name.endswith("/"):
            result += f" {name}"
        elif node_type in ("text", "paragraph", "listitem", "textbox"):
            result += f": {name}"
        else:
            result += f' "{name}"'

    if href:
        result += f' [href="{href}"]'
    if src:
        result += f' [src="{src}"]'
    if alt:
        result += f' [alt="{alt}"]'

    attributes: list[str] = []
    if node.get("level"):
        attributes.append(f"level={node['level']}")
    if "checked" in node:
        attributes.append(f"checked={_format_bool(node['checked'])}")
    if "selected" in node:
        attributes.append(f"selected={_format_bool(node['selected'])}")
    if "expanded" in node:
        attributes.append(f"expanded={_format_bool(node['expanded'])}")
    if node.get("disabled"):
        attributes.append("disabled")
    if node.get("required"):
        attributes.append("required")
    if "valuemin" in node or "valuemax" in node:
        vmin = js_num_to_str(node["valuemin"]) if "valuemin" in node else ""
        vmax = js_num_to_str(node["valuemax"]) if "valuemax" in node else ""
        attributes.append(f"range={vmin}-{vmax}")
    if node.get("valuetext"):
        attributes.append(f'value="{node["valuetext"]}"')
    if attributes:
        result += f" [{', '.join(attributes)}]"
    result += "\n"

    if children:
        if (len(children) == 1 and children[0]["type"] == node_type
                and node_type != "generic"):
            child = children[0]
            child_name = child.get("name")
            if name and child_name:
                combined = f"{name} {child_name}"
            else:
                combined = name or child_name or ""
            temp = {**node, "name": combined}
            if child.get("children"):
                temp["children"] = child["children"]
            else:
                temp.pop("children", None)
            return _node_to_string(temp, indent)
        for child in children:
            child_string = _node_to_string(child, indent + 1)
            if child_string:
                result += child_string
    return result


def aria_tree_to_string(tree: dict, max_links: int = 60) -> str:
    """YAML-ish Playwright-style rendering with link budget
    (reference src/nav/readableAria.ts:553-734)."""
    total_links = count_links(tree["root"])
    if total_links > max_links:
        weighted = assign_weights_to_tree(tree["root"])
        processed = filter_nodes_by_weight(weighted, max_links) or tree["root"]
    else:
        processed = tree["root"]
    result = _node_to_string(processed)
    if total_links > max_links:
        return (f"# 注: 元のツリーには{total_links}個のリンクがありましたが、"
                f"上限({max_links})に基づいてフィルタリングされています\n{result}")
    return result


def to_readable_aria_tree(doc: VDocument, max_links: int = 60) -> str:
    """reference src/nav/readableAria.ts:359-546."""
    tree = build_aria_tree(doc)
    return aria_tree_to_string(tree, max_links)
