"""TypeScript → ESM type-stripper for the byte-identity oracle.

The reference's per-document pipeline (dom/extract/format/markdown/aria)
has *type-only* cross-module imports except for a handful of pure-JS
value modules, so erasing the type syntax yields runnable ESM that node
(v20, present in the sandbox) executes directly.  This module performs
that erasure mechanically at TEST TIME — the generated .mjs lives under
/tmp and is never committed (the reference stays the single source of
truth, and no derived copy of it enters this repo).

Scope: exactly the TS surface used by the reference files listed in
ORACLE_FILES (verified by scan — no classes, no namespaces, no
decorators, no non-null assertions):

- ``import type`` / ``export type`` statements (incl. multi-line)
- ``interface`` / ``type`` alias declarations (balanced-brace removal)
- ``export const enum`` → plain frozen object literal
- parameter / variable / return type annotations (balanced ``<>()[]{}``
  scan, so ``Omit<X, "y"> & { z?: n }`` and object-literal types work)
- optional-parameter ``?`` markers, ``as T`` casts, type predicates
  (``x is T``), generic parameter lists on function declarations

The tokenizer understands strings, template literals (with nested
``${}``), comments, and regex-vs-division disambiguation — the stripper
never edits inside any of those.

Usage:  python tools/oracle/strip_ts.py [outdir]   (default: /tmp/readability_oracle_mjs)
"""

from __future__ import annotations

import os
import re
import sys

REFERENCE_SRC = "/root/reference/src"

# reference-relative path -> flat output module name
ORACLE_FILES = {
    "types.ts": "types",
    "constants.ts": "constants",
    "dom.ts": "dom",
    "extract/preprocess.ts": "preprocess",
    "extract/extract.ts": "extract",
    "format/format.ts": "format",
    "format/markdown.ts": "markdown",
    "nav/aria.ts": "aria",
    "nav/readableAria.ts": "readableAria",
    "nav/links.ts": "links",
    "nav/types.ts": "nav_types",
    "serializer.ts": "serializer",
    "readable.ts": "readable",
    "classify/classify.ts": "classify",
    "classify/constants.ts": "classify_constants",
    "classify/types.ts": "classify_types",
    "nav/hierarchy.ts": "hierarchy",
    "detect/index.ts": "detect_index",
    "detect/header.ts": "detect_header",
    "detect/navigation.ts": "detect_navigation",
    "detect/document.ts": "detect_document",
    "aria/utils.ts": "aria_utils",
    "parsers/htmlparser2.ts": "htmlparser2_impl",
}

# import-specifier (as written in each file) -> flat module name.
# Keyed by (importing file dir, spec) resolved to a normalized path.
def _resolve_spec(file_rel: str, spec: str) -> str | None:
    if not spec.startswith("."):
        return None  # bare import (htmlparser2) — caller stubs it
    base = os.path.dirname(file_rel)
    path = os.path.normpath(os.path.join(base, spec))
    for suffix in ("", ".ts"):
        cand = path + suffix
        if cand in ORACLE_FILES:
            return ORACLE_FILES[cand]
    if path in ("parsers/parser", "parsers/parser.ts"):
        return "parser_stub"
    raise KeyError(f"unmapped import {spec!r} from {file_rel!r}")


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

PUNCT3 = ("===", "!==", "...", "**=", "<<=", ">>=", "&&=", "||=", "??=")
PUNCT2 = ("=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "++", "--",
          "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>")

IDENT_START = re.compile(r"[A-Za-z_$]")
IDENT_RE = re.compile(r"[A-Za-z_$][\w$]*")
NUM_RE = re.compile(r"\d[\w.]*")
WS_RE = re.compile(r"[ \t\r\n]+")

# tokens after which a `/` begins a regex literal, not division
REGEX_PRECEDERS = {
    "(", ",", "=", ":", "[", "{", ";", "!", "&", "|", "?", "+", "-", "*",
    "%", "<", ">", "=>", "==", "===", "!=", "!==", "<=", ">=", "&&", "||",
    "??", "return", "case", "typeof", "in", "of", "new", "do", "else",
}


class Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind    # ws, comment, str, template, regex, num, ident, punct
        self.text = text

    def __repr__(self):
        return f"Tok({self.kind},{self.text!r})"


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(src)
    last_sig = None  # last significant token text

    def push(kind, text):
        nonlocal last_sig
        toks.append(Tok(kind, text))
        if kind not in ("ws", "comment"):
            last_sig = text

    while i < n:
        c = src[i]
        m = WS_RE.match(src, i)
        if m:
            toks.append(Tok("ws", m.group()))
            i = m.end()
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            j = n if j < 0 else j
            toks.append(Tok("comment", src[i:j]))
            i = j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            toks.append(Tok("comment", src[i:j + 2]))
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == c:
                    break
                j += 1
            push("str", src[i:j + 1])
            i = j + 1
            continue
        if c == "`":
            # template literal with ${} nesting
            j = i + 1
            depth = 0
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if depth == 0 and ch == "`":
                    break
                if ch == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if depth > 0 and ch == "{":
                    depth += 1
                elif depth > 0 and ch == "}":
                    depth -= 1
                j += 1
            push("template", src[i:j + 1])
            i = j + 1
            continue
        if c == "/" and (last_sig in REGEX_PRECEDERS or last_sig is None):
            # regex literal
            j = i + 1
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                j += 1
            j += 1
            while j < n and src[j] in "gimsuyd":
                j += 1
            push("regex", src[i:j])
            i = j
            continue
        m = IDENT_RE.match(src, i)
        if m:
            push("ident", m.group())
            i = m.end()
            continue
        m = NUM_RE.match(src, i)
        if m:
            push("num", m.group())
            i = m.end()
            continue
        for group in (PUNCT3, PUNCT2):
            hit = next((p for p in group if src.startswith(p, i)), None)
            if hit:
                push("punct", hit)
                i += len(hit)
                break
        else:
            push("punct", c)
            i += 1
    return toks


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

OPEN = {"(": ")", "[": "]", "{": "}", "<": ">"}


class Stripper:
    def __init__(self, toks: list[Tok], file_rel: str):
        self.toks = toks
        self.file_rel = file_rel
        self.keep = [True] * len(toks)
        # exported type/interface names erased from this module; they
        # get `export var NAME;` stubs so VALUE-style imports of type
        # names in other files (TS allows them) still resolve
        self.erased_exports: list[str] = []

    # -- token helpers ------------------------------------------------------
    def sig_next(self, i: int) -> int:
        """Index of next significant token at or after i, or len."""
        n = len(self.toks)
        while i < n and self.toks[i].kind in ("ws", "comment"):
            i += 1
        return i

    def sig_prev(self, i: int) -> int:
        while i >= 0 and self.toks[i].kind in ("ws", "comment"):
            i -= 1
        return i

    def drop(self, a: int, b: int):
        """Drop tokens [a, b)."""
        for k in range(a, b):
            self.keep[k] = False

    def skip_type(self, i: int, stop_arrow: bool = False) -> int:
        """Consume a type expression starting at significant index i.
        Returns the index of the token that TERMINATES it (not part of
        the type): depth-0 ``,`` ``;`` ``=`` ``)`` ``]`` ``}``, a ``{``
        that begins a function body (i.e. any ``{`` at depth 0 after at
        least one type atom was consumed — an object-literal type opens
        with ``{`` as its first token and is balanced away), and ``=>``
        when stop_arrow (return-type position; otherwise ``=>`` belongs
        to a function type and is consumed)."""
        depth = 0
        consumed = False
        prev = None  # last significant type token consumed
        n = len(self.toks)
        i = self.sig_next(i)
        while i < n:
            t = self.toks[i]
            if t.kind in ("ws", "comment"):
                i += 1
                continue
            txt = t.text
            if txt == "{":
                # `{` continues the type after `&`/`|` (intersection /
                # union with an object type); otherwise after a consumed
                # atom it begins the function body
                if depth == 0 and consumed and \
                        prev not in ("&", "|", "is"):
                    return i
                depth += 1
            elif txt in ("(", "[", "<"):
                depth += 1
            elif txt in (")", "]", "}"):
                if depth == 0:
                    return i
                depth -= 1
            elif txt == ">":
                if depth == 0:
                    return i
                depth -= 1
            elif depth == 0:
                if txt in (",", ";", "="):
                    return i
                if txt == "=>":
                    if stop_arrow:
                        return i
                    # function type: `(...) => T` — consume and continue
            consumed = True
            prev = txt
            i += 1
        return i

    # -- statement-level removals ------------------------------------------
    def remove_type_imports_and_aliases(self):
        toks = self.toks
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            if t.kind != "ident":
                i += 1
                continue
            j = self.sig_next(i + 1)
            if t.text in ("import", "export") and j < n and \
                    toks[j].kind == "ident" and toks[j].text == "type":
                # import type {...} from "x";  /  export type {..} from "x";
                # also: export type Foo = ...;
                k = self.sig_next(j + 1)
                if k < n and toks[k].kind == "ident" and \
                        self.sig_next(k + 1) < n and \
                        toks[self.sig_next(k + 1)].text == "=":
                    if t.text == "export":
                        self.erased_exports.append(toks[k].text)
                    # type alias: scan to ; at depth 0
                    k = self.sig_next(k + 1) + 1
                    k = self._scan_to_semicolon(k)
                else:
                    k = self._scan_to_semicolon(j + 1)
                self.drop(i, k)
                i = k
                continue
            if t.text == "type" and j < n and toks[j].kind == "ident":
                # bare `type X = ...;` at statement level — only when
                # previous significant token ends a statement
                p = self.sig_prev(i - 1)
                if p < 0 or toks[p].text in (";", "}", "{") or \
                        toks[p].kind == "comment":
                    k = self.sig_next(j + 1)
                    if k < n and toks[k].text == "=":
                        k = self._scan_to_semicolon(k + 1)
                        self.drop(i, k)
                        i = k
                        continue
            if t.text == "import" and j < n and toks[j].text == "{":
                # inline `type X,` specifiers inside a value import
                k = j + 1
                while k < n and toks[k].text != "}":
                    if self.keep[k] and toks[k].kind == "ident" and \
                            toks[k].text == "type":
                        m = self.sig_next(k + 1)
                        if m < n and toks[m].kind == "ident":
                            e = self.sig_next(m + 1)
                            if e < n and toks[e].text == ",":
                                e += 1  # drop trailing comma too
                            else:
                                e = m + 1
                            self.drop(k, e)
                            k = e
                            continue
                    k += 1
                i += 1
                continue
            if t.text in ("interface",) or (
                    t.text == "export" and j < n and
                    toks[j].text == "interface"):
                if t.text == "export":
                    name_i = self.sig_next(j + 1)
                    if name_i < n and toks[name_i].kind == "ident":
                        self.erased_exports.append(toks[name_i].text)
                start = i
                # find opening brace, then balance
                k = i
                while k < n and toks[k].text != "{":
                    k += 1
                depth = 0
                while k < n:
                    if toks[k].text == "{":
                        depth += 1
                    elif toks[k].text == "}":
                        depth -= 1
                        if depth == 0:
                            k += 1
                            break
                    k += 1
                self.drop(start, k)
                i = k
                continue
            i += 1

    def _scan_to_semicolon(self, i: int) -> int:
        """Scan to just past the `;` ending a statement (balanced braces)."""
        toks = self.toks
        n = len(toks)
        depth = 0
        while i < n:
            txt = toks[i].text
            if txt in ("{", "(", "["):
                depth += 1
            elif txt in ("}", ")", "]"):
                depth -= 1
            elif txt == ";" and depth <= 0:
                return i + 1
            i += 1
        return i

    def convert_const_enum(self):
        """`export const enum X { A = "a", }` → `export const X = { A: "a", };`"""
        toks = self.toks
        n = len(toks)
        for i in range(n):
            if toks[i].kind == "ident" and toks[i].text == "enum" and \
                    self.keep[i]:
                p = self.sig_prev(i - 1)
                if p >= 0 and toks[p].text == "const":
                    j = self.sig_next(i + 1)       # enum name
                    self.drop(i, j)                # drop `enum` keyword
                    k = self.sig_next(j + 1)       # expect {
                    assert toks[k].text == "{", "const enum shape"
                    toks.insert(k, Tok("punct", "= "))
                    self.keep.insert(k, True)
                    n += 1
                    depth = 0
                    while k < n:
                        txt = toks[k].text
                        if txt == "{":
                            depth += 1
                        elif txt == "}":
                            depth -= 1
                            if depth == 0:
                                toks.insert(k + 1, Tok("punct", ";"))
                                self.keep.insert(k + 1, True)
                                return
                        elif txt == "=" and depth == 1:
                            toks[k] = Tok("punct", ":")
                        k += 1

    # -- class support ------------------------------------------------------
    MODIFIERS = ("public", "private", "protected", "readonly", "override",
                 "abstract")
    KEYWORDS_NOT_FN = {"if", "for", "while", "switch", "catch", "return",
                       "new", "typeof", "else", "do", "await", "yield",
                       "in", "of", "delete", "void", "case", "function"}

    def strip_class_syntax(self):
        """Erase TS class-only syntax: access modifiers, field type
        annotations, method parameter/return annotations.  Fields and
        methods are only recognized INSIDE class bodies (depth 1 of a
        ``class X { ... }`` span), so object literals elsewhere are
        never touched."""
        toks = self.toks
        n = len(toks)
        # modifiers anywhere (interfaces already removed): drop when the
        # next significant token continues a declaration
        for i in range(n):
            if not self.keep[i] or toks[i].kind != "ident":
                continue
            if toks[i].text in self.MODIFIERS:
                j = self.sig_next(i + 1)
                if j < n and (toks[j].kind == "ident" or
                              toks[j].text in ("[", "*")):
                    self.drop(i, i + 1)
                    # drop one following ws run so indentation stays sane
                    if i + 1 < n and toks[i + 1].kind == "ws" and                             "\n" not in toks[i + 1].text:
                        self.drop(i + 1, i + 2)
        # non-null assertions: `expr!` — a `!` whose left neighbour is a
        # VALUE (non-keyword ident / ) / ] / string); unary `!x` has an
        # operator or keyword (`return !x`) on the left, and `!=`/`!==`
        # are single tokens
        value_breakers = {"return", "typeof", "case", "do", "else",
                          "void", "delete", "new", "await", "yield",
                          "in", "of", "instanceof", "throw"}
        for i in range(n):
            if self.keep[i] and toks[i].kind == "punct" and \
                    toks[i].text == "!":
                p = self.sig_prev(i - 1)
                if p >= 0 and (
                        (toks[p].kind == "ident"
                         and toks[p].text not in value_breakers)
                        or toks[p].kind == "str"
                        or toks[p].text in (")", "]")):
                    self.drop(i, i + 1)
        # class bodies: field annotations + method signatures
        i = 0
        while i < n:
            if self.keep[i] and toks[i].kind == "ident" and \
                    toks[i].text == "class":
                # `class X implements A, B {` — drop the implements list
                k = i
                while k < n and toks[k].text != "{":
                    if toks[k].kind == "ident" and \
                            toks[k].text == "implements":
                        m = k
                        while m < n and toks[m].text != "{" and \
                                toks[m].text != "extends":
                            m += 1
                        self.drop(k, m)
                        k = m
                        continue
                    k += 1
                end = self._match_brace(k)
                self._strip_class_body(k + 1, end)
                i = end
            i += 1

    def _match_brace(self, i: int) -> int:
        depth = 0
        n = len(self.toks)
        while i < n:
            if self.toks[i].text == "{":
                depth += 1
            elif self.toks[i].text == "}":
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        return n - 1

    def _strip_class_body(self, start: int, end: int):
        toks = self.toks
        i = start
        depth = 0
        while i < end:
            if not self.keep[i]:
                i += 1
                continue
            txt = toks[i].text
            if txt in ("{", "(", "["):
                depth += 1
            elif txt in ("}", ")", "]"):
                depth -= 1
            elif depth == 0 and toks[i].kind == "ident" and                     txt not in self.KEYWORDS_NOT_FN:
                j = self.sig_next(i + 1)
                if j < end and toks[j].text == "(":
                    # method signature — param list + return type
                    i = self._strip_param_list(j, arrow=False)
                    continue
                if j < end and toks[j].text == "?":
                    j2 = self.sig_next(j + 1)
                    if j2 < end and toks[j2].text == ":":
                        self.drop(j, j + 1)
                        j = j2
                if j < end and toks[j].text == ":":
                    t_end = self.skip_type(j + 1)
                    if t_end < end and toks[t_end].text in (";", "="):
                        self.drop(j, t_end)
                        i = t_end
                        continue
            i += 1

    # -- annotation removal -------------------------------------------------
    def strip_annotations(self):
        """Strip param-list annotations, return types, var annotations,
        `as T` casts, and generic parameter lists on declarations."""
        toks = self.toks
        n = len(toks)
        i = 0
        in_import = False  # inside an import/export-from statement
        while i < n:
            if not self.keep[i]:
                i += 1
                continue
            t = toks[i]
            if t.kind == "ident" and t.text in ("import", "export"):
                j = self.sig_next(i + 1)
                if j < n and toks[j].text == "{":
                    in_import = True
            elif in_import and t.text == ";":
                in_import = False
            if t.kind != "ident" and t.text != "(":
                i += 1
                continue
            # `function name<T>(` / `function (` — param list for sure
            if t.kind == "ident" and t.text == "function":
                j = self.sig_next(i + 1)
                if j < n and toks[j].kind == "ident":
                    j = self.sig_next(j + 1)
                if j < n and toks[j].text == "<":
                    # generic parameter list — drop balanced <...>
                    k, depth = j, 0
                    while k < n:
                        if toks[k].text == "<":
                            depth += 1
                        elif toks[k].text == ">":
                            depth -= 1
                            if depth == 0:
                                break
                        k += 1
                    self.drop(j, k + 1)
                    j = self.sig_next(k + 1)
                if j < n and toks[j].text == "(":
                    i = self._strip_param_list(j, arrow=False)
                    continue
            # arrow functions: `(` ... `)` [": T"] `=>`
            if t.text == "(":
                close = self._match_paren(i)
                if close is not None:
                    j = self.sig_next(close + 1)
                    if j < n and toks[j].text == "=>":
                        i = self._strip_param_list(i, arrow=True)
                        continue
                    if j < n and toks[j].text == ":":
                        end = self.skip_type(j + 1, stop_arrow=True)
                        k = self.sig_next(end)
                        if k < n and toks[k].text == "=>":
                            i = self._strip_param_list(i, arrow=True)
                            continue
            # `let/const/var name: T =`
            if t.kind == "ident" and t.text in ("let", "const", "var"):
                j = self.sig_next(i + 1)
                if j < n and toks[j].kind == "ident":
                    k = self.sig_next(j + 1)
                    if k < n and toks[k].text == ":":
                        end = self.skip_type(k + 1)
                        self.drop(k, end)
                        i = end
                        continue
            # `x as T` cast (never inside import/export specifier braces,
            # where `as` is a rename, not a cast)
            if t.kind == "ident" and t.text == "as" and not in_import:
                p = self.sig_prev(i - 1)
                if p >= 0 and (toks[p].kind in ("ident", "str", "num")
                               or toks[p].text in (")", "]")):
                    end = self.skip_type(i + 1)
                    self.drop(i, end)
                    # also drop one preceding ws run so `(child )` → `(child)`
                    i = end
                    continue
            i += 1

    def _match_paren(self, i: int) -> int | None:
        toks = self.toks
        depth = 0
        n = len(toks)
        while i < n:
            if toks[i].text == "(":
                depth += 1
            elif toks[i].text == ")":
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        return None

    def _strip_param_list(self, open_i: int, arrow: bool = True) -> int:
        """Strip annotations inside the param list opening at open_i and
        the return-type annotation after it.  Returns index past `)`."""
        toks = self.toks
        n = len(toks)
        close = self._match_paren(open_i)
        assert close is not None
        i = open_i + 1
        depth = 0
        while i < close:
            if not self.keep[i]:
                i += 1
                continue
            txt = toks[i].text
            if txt in ("(", "[", "{"):
                # nested destructuring/defaults/arrow params — recurse
                # into nested arrow param lists via outer loop; here just
                # track depth so we only strip at depth 0 of THIS list
                depth += 1
            elif txt in (")", "]", "}"):
                depth -= 1
            elif depth == 0 and txt == "?":
                j = self.sig_next(i + 1)
                if j < n and toks[j].text in (":", ",") or \
                        (j < n and toks[j].text == ")"):
                    # optional marker `x?:` / trailing `x?,` / `x?)`
                    self.drop(i, i + 1)
            elif depth == 0 and txt == ":":
                end = self.skip_type(i + 1, stop_arrow=False)
                self.drop(i, end)
                i = end
                continue
            i += 1
        # return type: `): T {` or `): T =>` — only strip when the type
        # terminates at `{` or `=>` (a ternary `cond ? (x) : y` stops at
        # some other token and survives intact)
        j = self.sig_next(close + 1)
        if j < n and toks[j].text == ":":
            # for a `function` declaration the body `{` is the only
            # terminator (`=>` there belongs to a function TYPE); for an
            # arrow, `=>` introduces the body and terminates the type
            end = self.skip_type(j + 1, stop_arrow=arrow)
            if end < n and toks[end].text in ("{", "=>"):
                self.drop(j, end)
        return close + 1

    # -- import rewriting ---------------------------------------------------
    def rewrite_imports(self):
        toks = self.toks
        n = len(toks)
        for i in range(n):
            if not self.keep[i]:
                continue
            if toks[i].kind == "ident" and toks[i].text == "from":
                j = self.sig_next(i + 1)
                if j < n and toks[j].kind == "str":
                    spec = toks[j].text[1:-1]
                    target = _resolve_spec(self.file_rel, spec)
                    if target is None:
                        target = "npm_stub"  # bare htmlparser2 import
                    toks[j] = Tok("str", f'"./{target}.mjs"')

    def render(self) -> str:
        out = "".join(t.text for t, k in zip(self.toks, self.keep) if k)
        stubs = []
        for name in dict.fromkeys(self.erased_exports):
            # only stub names with no surviving value declaration
            if (f"function {name}" in out or f"const {name}" in out
                    or f"class {name}" in out or f"var {name}" in out):
                continue
            stubs.append(f"export var {name};"
                         f"  // erased type — value-import stub\n")
        return out + ("\n" + "".join(stubs) if stubs else "")


def strip_file(file_rel: str) -> str:
    with open(os.path.join(REFERENCE_SRC, file_rel), encoding="utf-8") as f:
        src = f.read()
    toks = tokenize(src)
    assert "".join(t.text for t in toks) == src, f"tokenizer lossy: {file_rel}"
    s = Stripper(toks, file_rel)
    s.remove_type_imports_and_aliases()
    s.convert_const_enum()
    s.strip_class_syntax()
    s.strip_annotations()
    s.rewrite_imports()
    return s.render()


NPM_STUB = """\
// Oracle stub for the bare `htmlparser2` npm import: only the Parser
// symbol is referenced at module scope; constructing one (i.e. calling
// the real parseHTML) is unsupported in the oracle.
export class Parser {
  constructor() {
    throw new Error("oracle npm stub: htmlparser2 is not available");
  }
}
"""

PARSER_STUB = """\
// Oracle stub: the real parser (htmlparser2) is not available in the
// sandbox.  The oracle driver either injects pre-parsed VDOM via
// options.parser or, for entry points that call parseHTML internally
// (analyzePageStructure / extractDocumentContent / Readable.fromHTML),
// sets globalThis.__oracle_parsed before the call.
export function parseHTML() {
  if (globalThis.__oracle_parsed !== undefined) {
    return globalThis.__oracle_parsed;
  }
  throw new Error("oracle parser stub: pass options.parser");
}
export function serializeToHTML() {
  throw new Error("oracle parser stub: serializeToHTML unavailable");
}
"""


PIN_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "reference.sha256")


def reference_digest() -> str:
    """sha256 over the exact reference sources the oracle executes
    (sorted relpath + content), so a modified checkout can't silently
    feed new code to node."""
    import hashlib
    h = hashlib.sha256()
    for file_rel in sorted(ORACLE_FILES):
        path = os.path.join(REFERENCE_SRC, file_rel)
        h.update(file_rel.encode("utf-8") + b"\0")
        with open(path, "rb") as f:
            h.update(f.read())
        h.update(b"\0")
    return h.hexdigest()


def check_reference_pin() -> None:
    """Refuse to strip an unpinned/drifted reference tree (the oracle
    runs its code under node at test time).  Set
    READABILITY_ORACLE_ALLOW_DRIFT=1 to bypass after reviewing the
    checkout, or delete the pin file to re-pin."""
    digest = reference_digest()
    if not os.path.isfile(PIN_FILE):
        with open(PIN_FILE, "w", encoding="utf-8") as f:
            f.write(digest + "\n")
        return
    with open(PIN_FILE, encoding="utf-8") as f:
        pinned = f.read().strip()
    if digest != pinned and not os.environ.get(
            "READABILITY_ORACLE_ALLOW_DRIFT"):
        raise RuntimeError(
            f"reference tree at {REFERENCE_SRC} does not match the "
            f"pinned digest in {PIN_FILE} (got {digest}, pinned "
            f"{pinned}); review the checkout, then either delete the "
            "pin file to re-pin or set READABILITY_ORACLE_ALLOW_DRIFT=1")


def generate(outdir: str = "/tmp/readability_oracle_mjs") -> str:
    check_reference_pin()
    os.makedirs(outdir, exist_ok=True)
    for file_rel, mod in ORACLE_FILES.items():
        out = strip_file(file_rel)
        with open(os.path.join(outdir, mod + ".mjs"), "w",
                  encoding="utf-8") as f:
            f.write(out)
    with open(os.path.join(outdir, "parser_stub.mjs"), "w",
              encoding="utf-8") as f:
        f.write(PARSER_STUB)
    with open(os.path.join(outdir, "npm_stub.mjs"), "w",
              encoding="utf-8") as f:
        f.write(NPM_STUB)
    return outdir


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/readability_oracle_mjs"
    print(generate(outdir))
