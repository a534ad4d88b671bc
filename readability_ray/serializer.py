"""Snapshot serialization: flat id-keyed node table ↔ JSON
(reference src/serializer.ts).

Structure matches the reference's SerializableSnapshot: {rootId, nodes:
{id: {id,type,tagName,attributes,childrenIds,parentId,
readabilityScore | textContent}}, metadata, links, mainCandidates,
ariaTree, nodeCount, pageType}.  Two documented deviations where the
reference relies on JS-only accidents:
- LinkInfo.element is inlined as a raw object graph by JSON.stringify
  in TS (with WeakRef parents collapsing to ``{}``); here links carry
  {score, text, href} — the only fields any consumer reads.
- AriaNode.originalElement (WeakRef) serializes as ``{}`` in TS, i.e.
  the element pointer is lost on round-trip; here the ``el`` key is
  dropped, same effect.

As in the reference, deserialization cannot restore parent pointers
(serializer.ts:244-247): loaded snapshots support rendering but not
re-scoring.
"""

from __future__ import annotations

import json

from .extract import ExtractedSnapshot, LinkInfo, PageMetadata
from .vdom import ELEMENT, VElement, VText


def _serialize_tree(root) -> tuple[int, dict]:
    nodes: dict[int, dict] = {}
    counter = [0]
    node_ids: dict[int, int] = {}

    def assign_id(node) -> int:
        key = id(node)
        if key in node_ids:
            return node_ids[key]
        counter[0] += 1
        node_ids[key] = counter[0]
        return counter[0]

    def serialize_node(node, parent_id=None) -> int:
        nid = assign_id(node)
        if nid in nodes:
            if "parentId" not in nodes[nid] and parent_id is not None:
                nodes[nid]["parentId"] = parent_id
            return nid
        if node.nodeType == ELEMENT:
            entry = {
                "id": nid, "type": "element", "tagName": node.tag,
                "attributes": dict(node.attrs), "childrenIds": [],
            }
            # JS emits `parentId: undefined` for the root, which
            # JSON.stringify DROPS — mirror by omitting the key
            # (oracle-pinned, tests/test_oracle_node_extended.py)
            if parent_id is not None:
                entry["parentId"] = parent_id
            if node.score is not None:
                entry["readabilityScore"] = node.score
            nodes[nid] = entry
            entry["childrenIds"] = [
                serialize_node(child, nid) for child in node.children]
        else:
            nodes[nid] = {
                "id": nid, "type": "text", "textContent": node.text,
            }
            if parent_id is not None:
                nodes[nid]["parentId"] = parent_id
        return nid

    root_id = serialize_node(root)
    return root_id, nodes


def _aria_to_jsonable(node: dict | None):
    if node is None:
        return None
    out = {k: v for k, v in node.items() if k not in ("el", "children")}
    out["originalElement"] = {}  # WeakRef collapses to {} in the TS JSON
    children = node.get("children")
    # key-presence mirrors the TS AriaNode: `children` survives even
    # when the filter left it empty (oracle-pinned)
    if children is not None:
        out["children"] = [_aria_to_jsonable(c) for c in children]
    return out


def _link_jsonable(link):
    """LinkInfo → the raw JS object graph.  After ``load`` the element
    is the dict parsed from JSON (the reference keeps loaded links as
    plain objects and re-serializes them unchanged, serializer.ts:274);
    fresh links carry a live VElement."""
    element = link.element
    if isinstance(element, dict) or element is None:
        element_json = element
    else:
        element_json = _vnode_to_jsonable(element)
    return {"element": element_json, "href": link.href,
            "text": link.text, "score": link.score}


def _vnode_to_jsonable(node):
    """A VNode as JSON.stringify renders the reference's in-memory
    object (htmlparser2 shape + extract() mutations): WeakRef parents
    collapse to ``{}``, id/className accessors exist only when truthy,
    ``readability`` only once scored (oracle-pinned via the raw
    ``links`` payload in the serialized snapshot)."""
    if node.nodeType != ELEMENT:
        out = {"nodeType": "text", "textContent": node.text}
        if node.parent is not None:
            out["parent"] = {}
        return out
    out = {
        "nodeType": "element",
        "tagName": node.tag,
        "attributes": dict(node.attrs),
        "children": [_vnode_to_jsonable(c) for c in node.children],
    }
    if node.attrs.get("id"):
        out["id"] = node.attrs["id"]
    if node.attrs.get("class"):
        out["className"] = node.attrs["class"]
    if node.parent is not None:
        out["parent"] = {}
    if node.score is not None:
        out["readability"] = {"contentScore": node.score}
    return out


def serialize(snapshot: ExtractedSnapshot, page_type: str) -> str:
    """reference src/serializer.ts:121-161."""
    root_id = None
    nodes: dict[int, dict] = {}
    element_ids: dict[int, int] = {}
    if snapshot.root is not None:
        root_id, nodes = _serialize_tree(snapshot.root)
        # rebuild element→id lookup for candidates
        stack = [(snapshot.root, root_id)]
        flat = {n["id"]: n for n in nodes.values()}
        # walk in parallel: match by traversal order
        def index(node, nid):
            element_ids[id(node)] = nid
            if node.nodeType != ELEMENT:
                return
            child_ids = flat[nid].get("childrenIds", [])
            for child, cid in zip(node.children, child_ids):
                index(child, cid)
        index(snapshot.root, root_id)

    candidates = []
    for element, score in (snapshot.main_candidates or []):
        eid = element_ids.get(id(element))
        if eid is not None:
            candidates.append({"score": score, "elementId": eid})

    aria = snapshot.aria_tree
    data = {
        "rootId": root_id,
        "nodes": nodes,
        # metadata/links mirror `JSON.stringify(snapshot.metadata)` /
        # `...(snapshot.links)`: undefined-valued fields drop out, and
        # each LinkInfo carries its full element subtree (serializer.ts
        # comments call links "simple data" — they are not; the raw
        # object graph is the REAL behavior, quirks included)
        "metadata": {
            key: value for key, value in (
                ("title", snapshot.metadata.title),
                ("lang", snapshot.metadata.lang),
                ("siteName", snapshot.metadata.site_name),
                ("url", snapshot.metadata.url),
            ) if value is not None
        },
        "links": [_link_jsonable(link) for link in snapshot.links],
        "mainCandidates": candidates,
        "ariaTree": ({"root": _aria_to_jsonable(aria["root"]),
                      "nodeCount": aria["nodeCount"]}
                     if aria else None),
        "nodeCount": snapshot.node_count,
        "pageType": page_type,
    }
    return json.dumps(data)


def deserialize(json_string: str) -> tuple[ExtractedSnapshot, str]:
    """Two-phase rebuild (reference src/serializer.ts:209-284): create
    nodes, then link children; parents are unrecoverable."""
    data = json.loads(json_string)
    nodes_data = data.get("nodes", {})
    created: dict[int, object] = {}
    for id_str, node_data in nodes_data.items():
        nid = int(id_str)
        if node_data["type"] == "element":
            element = VElement(node_data["tagName"],
                               dict(node_data["attributes"]))
            if "readabilityScore" in node_data:
                element.score = node_data["readabilityScore"]
            created[nid] = element
        else:
            created[nid] = VText(node_data["textContent"])
    for id_str, node_data in nodes_data.items():
        if node_data["type"] != "element":
            continue
        parent = created[int(id_str)]
        parent.children = []
        for child_id in node_data["childrenIds"]:
            child = created.get(child_id)
            if child is not None:
                parent.children.append(child)

    root = created.get(data["rootId"]) if data.get("rootId") else None
    main_candidates = []
    for c in data.get("mainCandidates", []):
        element = created.get(c["elementId"])
        if element is not None and element.nodeType == ELEMENT:
            main_candidates.append((element, c["score"]))

    def aria_from_jsonable(node):
        if node is None:
            return None
        out = {k: v for k, v in node.items()
               if k not in ("children", "originalElement")}
        out["el"] = None
        # key-presence is part of the serialized form: an empty
        # children ARRAY must survive the round trip (the reference
        # keeps the loaded tree raw, so re-serializing is byte-stable)
        if node.get("children") is not None:
            out["children"] = [aria_from_jsonable(c)
                               for c in node["children"]]
        return out

    aria_data = data.get("ariaTree")
    aria_tree = ({"root": aria_from_jsonable(aria_data["root"]),
                  "nodeCount": aria_data["nodeCount"]}
                 if aria_data else None)

    metadata_data = data.get("metadata", {})
    snapshot = ExtractedSnapshot(
        root=root,
        node_count=data.get("nodeCount", 0),
        # keep the serialized element graph (a plain dict) so a
        # re-serialize round-trips byte-for-byte, as the reference does
        # (its loaded links stay raw objects, serializer.ts:274)
        links=[LinkInfo(link.get("element"), link["score"], link["text"],
                        link["href"])
               for link in data.get("links", [])],
        metadata=PageMetadata(
            title=metadata_data.get("title", ""),
            lang=metadata_data.get("lang"),
            site_name=metadata_data.get("siteName"),
            url=metadata_data.get("url", "")),
        main_candidates=main_candidates,
        aria_tree=aria_tree,
        page_type=data.get("pageType", "other"))
    return snapshot, data.get("pageType", "other")
