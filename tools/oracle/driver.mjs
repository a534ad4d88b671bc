// Byte-identity oracle driver: runs the REFERENCE pipeline (type-stripped
// to ESM by strip_ts.py) on pre-parsed VDOM shipped from the Python side.
//
// stdin:  NDJSON  {"id": ..., "doc": {...vdom_json.py encoding...},
//                  "options": {charThreshold?, nbTopCandidates?},
//                  "ops": ["extract" | "structure" | "doccontent" |
//                          "classify" | "hierarchy" | "serialize" |
//                          "readable", ...]}   (default ["extract"])
// stdout: NDJSON  {"id", ...op results..., "error"}
//
// The parser is injected via options.parser (the reference's own
// extension surface, src/types.ts:48) where the entry point supports
// it; entry points that call parseHTML internally (analyzePageStructure,
// extractDocumentContent, Readable.fromHTML) get the pre-parsed doc via
// the parser stub's globalThis.__oracle_parsed hook.  The reference
// pipeline MUTATES the tree (preprocess), so every op rebuilds a fresh
// doc from the JSON.
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
const { analyzePageStructure } = await import(u("detect_index"));
const { detectNavigations } = await import(u("detect_navigation"));
const { buildAriaTree } = await import(u("readableAria"));
const { extractDocumentContent } = await import(u("detect_document"));
const { classifySnapshot } = await import(u("classify"));
const { analyzeLinkHierarchy } = await import(u("hierarchy"));
const { serialize } = await import(u("serializer"));
const { Readable } = await import(u("readable"));
const { serializeToHTML } = await import(u("htmlparser2_impl"));
const { buildAriaNode } = await import(u("aria"));
const { preprocessDocument } = await import(u("preprocess"));

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

function navItemSummary(item) {
  return {
    label: item.label,
    href: item.href ?? null,
    level: item.level,
    is_current: item.isCurrent ?? null,
    is_active: item.isActive ?? null,
    children: (item.children ?? []).map(navItemSummary),
  };
}

function navSummary(nav) {
  if (!nav) return null;
  return {
    type: nav.type,
    location: nav.location,
    structure: nav.structure,
    label: nav.label ?? null,
    items: nav.items.map(navItemSummary),
  };
}

// FULL NavigationInfo/NavigationItem surface (navSummary above is the
// lossy view analyzePageStructure's comparison uses): every declared
// field including the never-set `icon`, plus the element's aria
// identity (type/role/name) as the AriaNode proxy.
function navItemFull(item) {
  return {
    label: item.label,
    href: item.href ?? null,
    level: item.level,
    is_current: item.isCurrent ?? null,
    is_active: item.isActive ?? null,
    icon: item.icon ?? null,
    children: (item.children ?? []).map(navItemFull),
  };
}

function navFull(nav) {
  return {
    el_type: nav.element.type,
    el_role: nav.element.role ?? null,
    el_name: nav.element.name ?? null,
    type: nav.type,
    location: nav.location,
    structure: nav.structure,
    label: nav.label ?? null,
    items: nav.items.map(navItemFull),
  };
}

function headerSummary(h) {
  if (!h) return null;
  return {
    type: h.type,
    is_sticky: h.isSticky,
    depth: h.depth,
    has_logo: h.contains.logo !== undefined,
    has_site_title: h.contains.siteTitle !== undefined,
    site_title_text: h.contains.siteTitle?.text ?? null,
    n_nav: h.contains.navigation?.length ?? 0,
    has_search: h.contains.search !== undefined,
  };
}

const OPS = {
  extract(doc, _docJson, options) {
    const snapshot = extract("", Object.assign({}, options, {
      parser: () => doc,
    }));
    const root = snapshot.root;
    return {
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
    };
  },

  structure(doc) {
    globalThis.__oracle_parsed = doc;
    try {
      const s = analyzePageStructure("");
      return {
        headers: s.headers.map(headerSummary),
        navigations: s.navigations.map(navSummary),
        main_header: headerSummary(s.mainHeader ?? null),
        main_navigation: navSummary(s.mainNavigation ?? null),
        breadcrumb: navSummary(s.breadcrumb ?? null),
        toc: navSummary(s.toc ?? null),
        has_main_content: s.mainContent !== undefined,
        has_sidebar: s.sidebar !== undefined,
        has_footer: s.footer !== undefined,
      };
    } finally {
      delete globalThis.__oracle_parsed;
    }
  },

  navdetail(doc) {
    // detectNavigations run DIRECTLY over the uncompressed aria tree
    // (the same tree analyzePageStructure builds, detect/index.ts:55)
    // — full-field comparison for the navigation detector.
    const tree = buildAriaTree(doc, { compress: false });
    return { navigations: detectNavigations(tree.root).map(navFull) };
  },

  doccontent(doc) {
    globalThis.__oracle_parsed = doc;
    try {
      const c = extractDocumentContent("");
      return {
        content: c.content,
        sidebar_nav: c.sidebarNav ?? null,
        toc: c.toc ?? null,
        breadcrumb: c.breadcrumb ?? null,
        outline: c.outline ?? null,
      };
    } finally {
      delete globalThis.__oracle_parsed;
    }
  },

  classify(doc, _docJson, options) {
    const snapshot = extract("", Object.assign({}, options, {
      parser: () => doc,
    }));
    const results = classifySnapshot(snapshot);
    return {
      results: results.map((r) => ({
        page_type: r.pageType,
        possibility: r.possibility,
        title: r.title ?? null,
        byline: r.byline ?? null,
      })),
    };
  },

  hierarchy(doc, _docJson, options) {
    const snapshot = extract("", Object.assign({}, options, {
      parser: () => doc,
    }));
    const a = analyzeLinkHierarchy(snapshot.links, snapshot.metadata);
    const rel = (links) => links.map((l) => [l.href ?? null, l.text]);
    return {
      parent: rel(a.parent),
      sibling: rel(a.sibling),
      child: rel(a.child),
      external: rel(a.external),
      scores: [...a.scores.entries()].sort(),
    };
  },

  serialize(doc, _docJson, options) {
    // via Readable so the serialized record carries the pageType,
    // matching the Python side's Readable.serialize()
    globalThis.__oracle_parsed = doc;
    try {
      const r = Readable.fromHTML("", options);
      return { serialized: r.serialize() };
    } finally {
      delete globalThis.__oracle_parsed;
    }
  },

  aria_raw(doc) {
    // uncompressed ARIA tree over the PREPROCESSED doc (the
    // extractAriaTree compress:false path, extract.ts:759-771)
    preprocessDocument(doc);
    const tree = buildAriaNode(doc.body);
    return JSON.parse(JSON.stringify(
      tree, (k, v) => (k === "originalElement" ? undefined : v)));
  },

  readable_load(doc, _docJson, options) {
    // serialize -> load round trip through the reference's own
    // deserializer (serializer.ts:209-284; parents unrecoverable)
    globalThis.__oracle_parsed = doc;
    try {
      const first = Readable.fromHTML("", options);
      const loaded = Readable.load(first.serialize(), options);
      return {
        page_type: loaded.pageType,
        markdown: loaded.toMarkdown(),
        title: loaded.snapshot.metadata.title,
        node_count: loaded.snapshot.nodeCount,
        n_links: loaded.snapshot.links.length,
        reserialized_equal: loaded.serialize() === first.serialize(),
      };
    } finally {
      delete globalThis.__oracle_parsed;
    }
  },

  serialize_html(doc) {
    // raw VDOM -> HTML text (htmlparser2.ts:140-181)
    return { html: serializeToHTML(doc.documentElement) };
  },

  readable(doc, _docJson, options) {
    globalThis.__oracle_parsed = doc;
    try {
      const r = Readable.fromHTML("", options);
      return {
        page_type: r.pageType,
        inferred: r.inferPageType(),
        markdown: r.toMarkdown(),
        title: r.snapshot.metadata.title,
        node_count: r.snapshot.nodeCount,
        n_links: r.snapshot.links.length,
      };
    } finally {
      delete globalThis.__oracle_parsed;
    }
  },
};

function processLine(line) {
  const req = JSON.parse(line);
  const out = { id: req.id, error: null };
  try {
    const ops = req.ops ?? ["extract"];
    for (const op of ops) {
      // fresh tree per op — the reference pipeline mutates it
      const doc = buildDocument(req.doc);
      const result = OPS[op](doc, req.doc, req.options || {});
      if (ops.length === 1 && op === "extract") {
        Object.assign(out, result); // back-compat flat shape
      } else {
        out[op] = result;
      }
    }
  } catch (err) {
    out.error = `${err.name}: ${err.message}`;
  }
  return out;
}

const rl = createInterface({ input: process.stdin, crlfDelay: Infinity });
for await (const line of rl) {
  if (!line.trim()) continue;
  process.stdout.write(JSON.stringify(processLine(line)) + "\n");
}
