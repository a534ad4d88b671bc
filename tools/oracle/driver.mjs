// Byte-identity oracle driver: runs the REFERENCE pipeline (type-stripped
// to ESM by strip_ts.py) on pre-parsed VDOM shipped from the Python side.
//
// stdin:  NDJSON  {"id": ..., "doc": {...vdom_json.py encoding...},
//                  "options": {charThreshold?, nbTopCandidates?}}
// stdout: NDJSON  {"id", "title", "lang", "site_name", "node_count",
//                  "text", "markdown", "html", "aria", "links",
//                  "candidate_scores", "error"}
//
// The parser is injected via options.parser (the reference's own
// extension surface, src/types.ts:48), so everything downstream —
// preprocess, scoring, classification, ARIA build, formatters — is the
// reference's real code.
//
// Usage: node driver.mjs <mjs_dir>

import { createInterface } from "node:readline";
import { pathToFileURL } from "node:url";

const mjsDir = process.argv[2] || "/tmp/readability_oracle_mjs";
const u = (m) => pathToFileURL(`${mjsDir}/${m}.mjs`).href;

const { extract } = await import(u("extract"));
const { stringify, formatDocument, toHTML, countNodes } = await import(u("format"));
const { toMarkdown } = await import(u("markdown"));
const { ariaTreeToString } = await import(u("readableAria"));

function buildNode(json, parent) {
  if ("x" in json) {
    const node = { nodeType: "text", textContent: json.x };
    if (parent) node.parent = new WeakRef(parent);
    return node;
  }
  const el = {
    nodeType: "element",
    tagName: json.t,
    attributes: json.a || {},
    children: [],
  };
  // Mirror htmlparser2.ts:45-46,83-84: id/className accessors set only
  // when the attribute is truthy.
  if (el.attributes.id) el.id = el.attributes.id;
  if (el.attributes.class) el.className = el.attributes.class;
  if (parent) el.parent = new WeakRef(parent);
  for (const ch of json.c || []) {
    el.children.push(buildNode(ch, el));
  }
  return el;
}

function buildDocument(json) {
  const documentElement = buildNode(json.root, null);
  let body;
  if (json.body_path === null || json.body_path === undefined) {
    body = buildNode(json.body, null); // detached (fragment quirk)
  } else {
    body = documentElement;
    for (const idx of json.body_path) body = body.children[idx];
  }
  const doc = { documentElement, body };
  if (json.base_uri) doc.baseURI = json.base_uri;
  if (json.document_uri) doc.documentURI = json.document_uri;
  return doc;
}

function processLine(line) {
  const req = JSON.parse(line);
  try {
    const doc = buildDocument(req.doc);
    const options = Object.assign({}, req.options || {}, {
      parser: () => doc,
    });
    const snapshot = extract("", options);
    const root = snapshot.root;
    return {
      id: req.id,
      title: snapshot.metadata.title,
      lang: snapshot.metadata.lang ?? null,
      site_name: snapshot.metadata.siteName ?? null,
      url: snapshot.metadata.url,
      node_count: snapshot.nodeCount,
      text: root ? formatDocument(stringify(root)) : "",
      markdown: root ? toMarkdown(root) : "",
      html: root ? toHTML(root) : "",
      aria: snapshot.ariaTree ? ariaTreeToString(snapshot.ariaTree) : "",
      links: snapshot.links.map((l) => [l.href ?? null, l.text]),
      candidate_scores: snapshot.mainCandidates.map((c) => c.score),
      root_tag: root ? root.tagName : null,
      error: null,
    };
  } catch (err) {
    return { id: req.id, error: `${err.name}: ${err.message}` };
  }
}

const rl = createInterface({ input: process.stdin, crlfDelay: Infinity });
for await (const line of rl) {
  if (!line.trim()) continue;
  process.stdout.write(JSON.stringify(processLine(line)) + "\n");
}
