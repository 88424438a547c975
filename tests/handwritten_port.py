"""Machine-extraction of the reference's HAND-WRITTEN ExUnit suites
(/root/reference/test/xema/*_test.exs) into (schema, value, expect_valid,
message) cases runnable against this engine's scalar validator.

The generated JSON-Schema-Test-Suite corpus is already ported 100 %
(tests/suite_port.py); these hand-written files carry the *Elixir-DSL*
edge semantics that corpus can't: atom-vs-string map keys, keyword lists,
tuple schemas, Elixir-native enum/const values, per-keyword error message
phrasings (validation_error.ex:121-411).

Only test DATA (schema/value literals and expected verdicts) is extracted
— the same oracle usage as suite_port.py, no code is translated.

Pipeline:  tokenize (Elixir subset) → parse terms → scan ExUnit structure
(describe/setup/test) → convert Xema.new terms to this repo's DSL source
and Elixir values to Python values (Atom marks atoms, tuples stay tuples,
keyword lists become (Atom, v) tuple lists, %M{} structs become dicts
with a "__struct__" key).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any, Optional

from xema_ray.functions.scalar import Atom

REF_DIR = "/root/reference/test/xema"


# ----------------------------------------------------------------------
# tokenizer
# ----------------------------------------------------------------------

@dataclass
class Tok:
    kind: str  # atom ident int float string regex punct kw
    val: Any
    pos: int


_KEYWORDS = {"do", "end", "true", "false", "nil", "fn", "describe", "setup",
             "test", "assert", "refute", "defmodule", "use", "import",
             "alias", "if", "else", "case", "cond", "for", "quote"}

_PUNCT3 = ("===", "!==", "...")
_PUNCT2 = ("=>", "==", "!=", "->", "<-", "::", "<>", "|>", "&&", "||", "..",
           ">=", "<=")
_PUNCT1 = tuple("%{}[](),=|&:<>+-*/!^.@#?")


def tokenize(src: str) -> list:
    toks: list = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":  # comment to EOL
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith('"""', i):  # heredoc
            j = src.find('"""', i + 3)
            body = src[i + 3:j]
            # Elixir heredocs strip the closing line's indentation and the
            # leading newline; a trailing backslash joins the last line
            body = body.lstrip("\n")
            indent = re.match(r"[ \t]*$", src[i + 3:j].split("\n")[-1])
            lines = body.split("\n")
            strip = len(lines[-1]) if re.fullmatch(r"[ \t]*", lines[-1] or "") else 0
            out = "\n".join(l[strip:] if l[:strip].isspace() or l[:strip] == "" else l
                            for l in lines[:-1])
            out = out.replace("\\\n", "")
            if out.endswith("\\") and not out.endswith("\\\\"):
                out = out[:-1]  # trailing \ escapes the final newline
            toks.append(Tok("string", _unescape(out), i))
            i = j + 3
            continue
        if c == '"':
            j, s = _scan_string(src, i + 1, '"')
            # `"quoted atom": v` keyword-key sugar (:"tilda~field")
            if src[j:j + 1] == ":" and src[j + 1:j + 2] != ":":
                toks.append(Tok("kwkey", s, i))
                i = j + 1
            else:
                toks.append(Tok("string", s, i))
                i = j
            continue
        if c == "'":
            j, s = _scan_string(src, i + 1, "'")
            toks.append(Tok("charlist", s, i))
            i = j
            continue
        if c == "~":  # sigils: ~r/../ ~r|..| ~s|..| ~D[..] ~U[..] etc.
            m = re.match(r"~([a-zA-Z])(.)", src[i:])
            if m:
                kind_ch, opener = m.group(1), m.group(2)
                closer = {"(": ")", "[": "]", "{": "}", "<": ">"}.get(opener, opener)
                j = i + 3
                buf = []
                while j < n and src[j] != closer:
                    if src[j] == "\\" and j + 1 < n:
                        buf.append(src[j:j + 2])
                        j += 2
                        continue
                    buf.append(src[j])
                    j += 1
                j += 1
                mods = re.match(r"[a-z]*", src[j:]).group(0)
                j += len(mods)
                body = "".join(buf)
                if kind_ch == "r":
                    toks.append(Tok("regex", (body, mods), i))
                elif kind_ch in "sS":
                    toks.append(Tok("string", _unescape(body), i))
                elif kind_ch in "wW":
                    toks.append(Tok("wordlist", body.split(), i))
                else:  # ~D ~T ~U ~N — date/time sigils
                    toks.append(Tok("sigil", (kind_ch, body), i))
                i = j
                continue
        if c == ":" and i + 1 < n and (src[i + 1].isalpha() or src[i + 1] in '_"'):
            if src[i + 1] == '"':
                j, s = _scan_string(src, i + 2, '"')
                toks.append(Tok("atom", s, i))
                i = j
                continue
            m = re.match(r":([A-Za-z_][A-Za-z0-9_]*[!?]?)", src[i:])
            toks.append(Tok("atom", m.group(1), i))
            i += m.end()
            continue
        m = re.match(r"\d[\d_]*\.\d[\d_]*(?:[eE][+-]?\d+)?", src[i:])
        if m:
            toks.append(Tok("float", float(m.group(0).replace("_", "")), i))
            i += m.end()
            continue
        m = re.match(r"0x[0-9a-fA-F_]+|\d[\d_]*", src[i:])
        if m:
            toks.append(Tok("int", int(m.group(0).replace("_", ""), 0), i))
            i += m.end()
            continue
        if c == "@" and i + 1 < n and src[i + 1].isalpha():
            m = re.match(r"@([a-z_][A-Za-z0-9_]*)", src[i:])
            toks.append(Tok("attr", m.group(1), i))
            i += m.end()
            continue
        m = re.match(r"[A-Za-z_][A-Za-z0-9_]*[!?]?", src[i:])
        if m:
            w = m.group(0)
            # `foo:` keyword-list key sugar (NOT ternary-ish `x ? a : b`)
            if src[i + m.end():i + m.end() + 1] == ":" and \
               src[i + m.end() + 1:i + m.end() + 2] != ":":
                toks.append(Tok("kwkey", w, i))
                i += m.end() + 1
                continue
            toks.append(Tok("kw" if w in _KEYWORDS else "ident", w, i))
            i += m.end()
            continue
        if src.startswith('"', i):
            continue
        for p in _PUNCT3 + _PUNCT2:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, i))
                i += len(p)
                break
        else:
            toks.append(Tok("punct", c, i))
            i += 1
    return toks


def _scan_string(src: str, i: int, quote: str):
    buf = []
    n = len(src)
    while i < n and src[i] != quote:
        if src[i] == "\\":
            buf.append(src[i:i + 2])
            i += 2
            continue
        buf.append(src[i])
        i += 1
    return i + 1, _unescape("".join(buf))


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'",
            "s": " ", "0": "\0", "a": "\a", "b": "\b", "e": "\x1b",
            "f": "\f", "v": "\v", "|": "|", "#": "#"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                m = re.match(r"\\u\{([0-9a-fA-F]+)\}|\\u([0-9a-fA-F]{4})", s[i:])
                if m:
                    out.append(chr(int(m.group(1) or m.group(2), 16)))
                    i += m.end()
                    continue
            if nxt == "x":
                m = re.match(r"\\x([0-9a-fA-F]{1,2})", s[i:])
                if m:
                    out.append(chr(int(m.group(1), 16)))
                    i += m.end()
                    continue
            out.append(_ESCAPES.get(nxt, "\\" + nxt))
            i += 2
            continue
        out.append(s[i])
        i += 1
    return "".join(out)


# ----------------------------------------------------------------------
# term parser — produces Python-ish AST nodes
# ----------------------------------------------------------------------

class Unsupported(Exception):
    pass


#: sentinel: a cast asserted to succeed whose result is pattern-bound —
#: there is no literal expected value to compare against
NO_EXPECTED = object()


@dataclass
class Call:
    name: str
    args: list


@dataclass
class Var:
    name: str


@dataclass
class KwList:
    items: list  # [(atom_name, term)]


@dataclass
class Struct:
    module: str
    fields: list  # [(atom_name, term)]


@dataclass(frozen=True)
class RegexT:
    pattern: str
    mods: str


@dataclass
class SigilT:
    kind: str
    body: str


class P:
    """Cursor over a token list."""

    def __init__(self, toks: list, i: int = 0):
        self.t = toks
        self.i = i

    def peek(self, off=0) -> Optional[Tok]:
        j = self.i + off
        return self.t[j] if j < len(self.t) else None

    def next(self) -> Tok:
        tok = self.t[self.i]
        self.i += 1
        return tok

    def at_punct(self, *vals) -> bool:
        p = self.peek()
        return p is not None and p.kind == "punct" and p.val in vals

    def expect(self, val):
        if not self.at_punct(val):
            raise Unsupported(f"expected {val!r} got {self.peek()}")
        return self.next()


def parse_term(p: P):
    """One Elixir term (no operators beyond module paths / ranges)."""
    tok = p.peek()
    if tok is None:
        raise Unsupported("eof")
    if tok.kind in ("int", "float", "string", "regex", "wordlist"):
        p.next()
        t = {"int": tok.val, "float": tok.val}.get(tok.kind, tok.val)
        if tok.kind == "regex":
            t = RegexT(*tok.val)
        base = t
        # integer ranges 1..5
        if tok.kind == "int" and p.at_punct(".."):
            p.next()
            hi = p.next()
            return ("range", base, hi.val)
        return base
    if tok.kind == "sigil":
        p.next()
        return SigilT(*tok.val)
    if tok.kind == "attr":  # @set — module attribute, resolved as a var
        p.next()
        return Var("@" + tok.val)
    if tok.kind == "charlist":
        p.next()
        return list(tok.val.encode())
    if tok.kind == "atom":
        p.next()
        return Atom(tok.val)
    if tok.kind == "kw":
        if tok.val in ("true", "false"):
            p.next()
            return tok.val == "true"
        if tok.val == "nil":
            p.next()
            return None
        if tok.val == "fn":
            _skip_fn(p)
            return ("fn",)
        raise Unsupported(f"kw {tok.val}")
    if tok.kind == "kwkey":
        return _parse_kwlist(p)
    if tok.kind == "punct":
        if tok.val == "-":
            p.next()
            inner = parse_term(p)
            if isinstance(inner, (int, float)):
                return -inner
            raise Unsupported("unary - on non-number")
        if tok.val == "{":
            p.next()
            items = _parse_items(p, "}")
            return tuple(items)
        if tok.val == "[":
            p.next()
            if p.peek() and p.peek().kind == "kwkey":
                kw = _parse_kwlist(p)
                p.expect("]")
                return kw
            items = _parse_items(p, "]")
            return items
        if tok.val == "%":
            p.next()
            nxt = p.peek()
            if nxt.kind == "punct" and nxt.val == "{":
                p.next()
                return _parse_map(p)
            if nxt.kind == "ident":  # %Module{...} / %Module.Sub{...}
                mod = _parse_module_path(p)
                p.expect("{")
                m = _parse_map(p)
                fields = []
                for k, v in (m.items() if isinstance(m, dict) else []):
                    fields.append((k, v))
                return Struct(mod, fields)
        raise Unsupported(f"punct {tok.val}")
    if tok.kind == "ident":
        # Module path / calls / plain vars
        name = _parse_module_path(p)
        if p.at_punct("("):
            p.next()
            args = _parse_items(p, ")", allow_kw_tail=True)
            return Call(name, args)
        return Var(name)
    raise Unsupported(f"token {tok}")


def _parse_module_path(p: P) -> str:
    parts = [p.next().val]
    while p.at_punct(".") and p.peek(1) is not None and \
            p.peek(1).kind in ("ident", "kw"):
        p.next()
        parts.append(p.next().val)
    return ".".join(parts)


def _parse_items(p: P, closer: str, allow_kw_tail: bool = True) -> list:
    items: list = []
    while not p.at_punct(closer):
        if allow_kw_tail and p.peek() and p.peek().kind == "kwkey":
            items.append(_parse_kwlist(p))
            break
        items.append(parse_term(p))
        if p.at_punct(","):
            p.next()
        elif not p.at_punct(closer):
            raise Unsupported(f"bad list sep at {p.peek()}")
    p.expect(closer)
    return items


def _parse_kwlist(p: P) -> KwList:
    items = []
    while p.peek() and p.peek().kind == "kwkey":
        key = p.next().val
        val = parse_term(p)
        items.append((key, val))
        if p.at_punct(","):
            p.next()
        else:
            break
    return KwList(items)


def _parse_map(p: P):
    """After the opening '{' of %{...}: atom-key sugar and => both."""
    out: dict = {}
    while not p.at_punct("}"):
        tok = p.peek()
        if tok.kind == "kwkey":  # %{foo: 1}
            p.next()
            out[Atom(tok.val)] = parse_term(p)
        else:
            k = parse_term(p)
            p.expect("=>")
            out[_freeze(k)] = parse_term(p)
        if p.at_punct(","):
            p.next()
    p.expect("}")
    return out


def _freeze(k):
    if isinstance(k, list):
        return tuple(_freeze(x) for x in k)
    return k


def _skip_fn(p: P):
    """Skip `fn ... end` bodies (custom validators — not portable data)."""
    p.next()  # fn
    depth = 1
    while depth:
        tok = p.next()
        if tok.kind == "kw" and tok.val in ("fn", "do"):
            depth += 1
        elif tok.kind == "kw" and tok.val == "end":
            depth -= 1


# ----------------------------------------------------------------------
# ExUnit structure scanner
# ----------------------------------------------------------------------

@dataclass
class TestCase:
    file: str
    describe: str
    test: str
    schema_term: Any
    value_term: Any
    expect_valid: bool
    message: Optional[str] = None
    fail_mode: Optional[str] = None
    op: str = "validate"            # "validate" | "cast" | "cast_value"
    expected_term: Any = None       # cast: the expected {:ok, X} payload
    expect_error: Optional[str] = None  # cast: "cast" | "validation"
    ap_opt: Optional[str] = None    # cast/3 additional_properties: :delete


@dataclass
class SkipNote:
    file: str
    where: str
    reason: str


def _find_do_end(toks: list, i: int) -> int:
    """Index just past the `end` matching the `do` at toks[i]."""
    assert toks[i].kind == "kw" and toks[i].val == "do"
    depth = 1
    i += 1
    while i < len(toks):
        t = toks[i]
        if t.kind == "kw" and t.val in ("do", "fn"):
            depth += 1
        elif t.kind == "kw" and t.val == "end":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise Unsupported("unbalanced do/end")


def extract_file(path: str):
    src = open(path).read()
    toks = tokenize(src)
    cases: list = []
    skips: list = []
    fname = os.path.basename(path)
    i = 0
    module_setup: dict = {}

    def scan_block(i, end, describe, schemas):
        while i < end:
            t = toks[i]
            if t.kind == "attr":  # @set [...] module attribute
                p = P(toks, i + 1)
                try:
                    schemas["@" + t.val] = parse_term(p)
                    i = p.i
                    continue
                except Unsupported:
                    i += 1
                    continue
            if t.kind == "kw" and t.val == "describe":
                name = toks[i + 1].val
                j = i + 2
                while not (toks[j].kind == "kw" and toks[j].val == "do"):
                    j += 1
                be = _find_do_end(toks, j)
                scan_block(j + 1, be - 1, name, dict(schemas))
                i = be
                continue
            if t.kind == "kw" and t.val == "setup":
                j = i + 1
                while not (toks[j].kind == "kw" and toks[j].val == "do"):
                    j += 1
                be = _find_do_end(toks, j)
                try:
                    schemas.update(_extract_setup(toks, j + 1, be - 1))
                except Unsupported as e:
                    skips.append(SkipNote(fname, f"{describe} setup", str(e)))
                i = be
                continue
            if t.kind == "kw" and t.val == "test":
                name = toks[i + 1].val if toks[i + 1].kind == "string" else "?"
                j = i + 1
                while not (toks[j].kind == "kw" and toks[j].val == "do"):
                    j += 1
                be = _find_do_end(toks, j)
                # `test "...", %{setup_name: alias} do` — rebind aliases;
                # nested one-level destructure %{invalid: %{multi: data}}
                # binds `data` to setup["invalid"][:multi] (opt_fail_test)
                tschemas = dict(schemas)
                hp = P(toks[:j], i + 2)
                while hp.i < j:
                    tok = hp.peek()
                    if tok.kind == "kwkey" and hp.peek(1) is not None:
                        nxt = hp.peek(1)
                        if nxt.kind == "ident":
                            if tok.val in schemas:
                                tschemas[nxt.val] = schemas[tok.val]
                            hp.next()
                        elif nxt.kind == "punct" and nxt.val == "%" and \
                                hp.peek(2) is not None and \
                                hp.peek(2).kind == "punct" and hp.peek(2).val == "{":
                            base = schemas.get(tok.val)
                            hp.next(); hp.next(); hp.next()
                            while hp.i < j and not hp.at_punct("}"):
                                sk = hp.peek()
                                sv = hp.peek(1)
                                if sk is not None and sk.kind == "kwkey" and \
                                        sv is not None and sv.kind == "ident":
                                    if isinstance(base, dict):
                                        v = base.get(Atom(sk.val))
                                        if v is None:
                                            v = base.get(sk.val)
                                        if v is not None:
                                            tschemas[sv.val] = v
                                    hp.next()
                                hp.next()
                    hp.next()
                try:
                    cases.extend(
                        _extract_test(toks, j + 1, be - 1, fname, describe,
                                      name, tschemas))
                except Unsupported as e:
                    skips.append(SkipNote(fname, f"{describe} / {name}", str(e)))
                i = be
                continue
            i += 1

    scan_block(0, len(toks), "", module_setup)
    return cases, skips


def _extract_setup(toks, i, end) -> dict:
    """schema bindings from a setup block: `%{schema: Xema.new(...)}` or
    `schema = Xema.new(...)` then `%{schema: schema}` (any names)."""
    out: dict = {}
    p = P(toks[:end], i)
    while p.i < end:
        t = p.peek()
        if t.kind == "ident" and p.peek(1) is not None and \
                p.peek(1).kind == "punct" and p.peek(1).val == "=" and \
                (p.peek(2) is None or not (p.peek(2).kind == "punct" and p.peek(2).val == "=")):
            name = p.next().val
            p.next()
            out[name] = parse_term(p)
            continue
        if t.kind == "punct" and t.val == "%" and p.peek(1) is not None and \
                p.peek(1).kind == "punct" and p.peek(1).val == "{":
            p.next(); p.next()
            m = _parse_map(p)
            for k, v in m.items():
                if isinstance(v, Var) and v.name in out:
                    out[str(k)] = out[v.name]
                else:
                    out[str(k)] = v
            continue
        p.next()
    return {k: v for k, v in out.items()}


def _extract_test(toks, i, end, fname, describe, testname, schemas,
                  depth: int = 0) -> list:
    cases: list = []
    local = dict(schemas)
    p = P(toks[:end], i)
    last_err_case: Optional[TestCase] = None
    unparsed = 0

    def resolve(term):
        seen = 0
        while isinstance(term, Var):
            if term.name not in local or seen > 4:
                raise Unsupported(f"unbound var {term.name}")
            term = local[term.name]
            seen += 1
        return term

    while p.i < end:
        t = p.peek()
        # local binding:  name = TERM   (but not == / pattern asserts)
        if t.kind == "ident" and p.peek(1) is not None and \
                p.peek(1).kind == "punct" and p.peek(1).val == "=" and \
                not (p.peek(2) and p.peek(2).kind == "punct" and p.peek(2).val == "="):
            name = p.next().val
            p.next()
            try:
                local[name] = parse_term(p)
            except Unsupported:
                pass
            continue
        # Enum.each(@set, fn data -> ... end) — expand per element
        if t.kind == "ident" and t.val == "Enum" and depth < 3 and \
                p.peek(1) is not None and p.peek(1).kind == "punct" and \
                p.peek(1).val == "." and p.peek(2) is not None and \
                p.peek(2).val == "each":
            p.next(); p.next(); p.next()
            try:
                p.expect("(")
                seq = _resolve_deep(parse_term(p), resolve)
                p.expect(",")
                if not (p.peek().kind == "kw" and p.peek().val == "fn"):
                    raise Unsupported("each without fn")
                p.next()
                var = p.next().val
                if p.at_punct("->"):
                    p.next()
                body_start = p.i
                d = 1
                while d:
                    tok = p.next()
                    if tok.kind == "kw" and tok.val in ("fn", "do"):
                        d += 1
                    elif tok.kind == "kw" and tok.val == "end":
                        d -= 1
                body_end = p.i - 1
                p.expect(")")
                if isinstance(seq, list):
                    for elem in seq:
                        sub = dict(local)
                        sub[var] = elem
                        cases.extend(_extract_test(
                            toks[:end], body_start, body_end, fname, describe,
                            f"{testname}[{elem!r:.20}]", sub, depth + 1))
            except Unsupported:
                pass
            continue
        if t.kind == "kw" and t.val in ("assert", "refute"):
            positive = t.val == "assert"
            p.next()
            got = _parse_assert(p, positive, resolve)
            if got is None:
                unparsed += 1
                continue
            kind = got[0]
            if kind == "case":
                c = TestCase(fname, describe, testname, *got[1:])
                cases.append(c)
                last_err_case = c if not c.expect_valid else None
            elif kind == "message" and last_err_case is not None:
                if last_err_case.message is None:
                    last_err_case.message = got[1]
            continue
        p.next()
    if unparsed and not cases:
        raise Unsupported(f"{unparsed} unparsed asserts, 0 cases")
    return cases


def _parse_assert(p: P, positive: bool, resolve):
    """One assert/refute expression → ('case', schema, value, expect_valid)
    | ('message', text) | None."""
    paren = False
    if p.at_punct("("):
        p.next()
        paren = True
    t = p.peek()
    if t is None:
        return None
    # assert {:error, PATTERN} = validate(schema, v) | cast(schema, v)
    if t.kind == "punct" and t.val == "{":
        start = p.i
        depth = 0
        while True:
            tok = p.peek()
            if tok is None:
                return None
            if tok.kind == "punct" and tok.val in "{[(":
                depth += 1
            elif tok.kind == "punct" and tok.val in ")]}":
                depth -= 1
                if depth == 0:
                    p.next()
                    break
            p.next()
        pat_toks = p.t[start:p.i]
        pat_names = {tok.val for tok in pat_toks if tok.kind == "ident"}
        if not p.at_punct("="):
            return None
        p.next()
        # {:ok, var} = cast(...) is a SUCCESS pattern, not an error one
        expect = "ok" if (len(pat_toks) > 1 and pat_toks[1].kind == "atom"
                          and pat_toks[1].val == "ok") else "error"
        return _parse_validate_call(p, positive, expect=expect,
                                    resolve=resolve, pat_names=pat_names)
    _FNS = ("validate", "valid?", "validate!", "cast", "cast!", "cast_value")
    if t.kind == "ident" and (
        t.val in _FNS
        or (t.val == "Xema" and p.peek(2) is not None
            and p.peek(2).val in _FNS)
    ):
        return _parse_validate_call(p, positive, expect=None, resolve=resolve)
    if t.kind == "ident" and t.val == "Exception":
        # Exception.message(error) == "..."
        term = parse_term(p)  # the call
        if p.at_punct("=="):
            p.next()
            msg = parse_term(p)
            if isinstance(msg, str):
                return ("message", msg)
            if isinstance(msg, Var):
                try:
                    m = resolve(msg)
                    if isinstance(m, str):
                        return ("message", m)
                except Unsupported:
                    return None
        return None
    return None


def _parse_validate_call(p: P, positive: bool, expect, resolve,
                         pat_names=frozenset()):
    t = p.next()
    if t.val == "Xema" and p.at_punct("."):
        p.next()
        t = p.next()
    fn = t.val
    if fn not in ("validate", "valid?", "validate!", "cast", "cast!",
                  "cast_value"):
        return None
    p.expect("(")
    schema_t = parse_term(p)
    p.expect(",")
    value_t = parse_term(p)
    fail_mode = None
    ap_opt = None
    if p.at_punct(","):  # validate/3 / cast/3 opts
        p.next()
        opts = _resolve_deep(parse_term(p), resolve)
        if isinstance(opts, KwList):
            opts = dict(opts.items)
            fm = opts.get("fail")
            if isinstance(fm, Atom):
                fail_mode = str(fm)
            ap = opts.get("additional_properties")
            if isinstance(ap, Atom):
                ap_opt = str(ap)
    p.expect(")")
    schema_t = resolve(schema_t)
    value_t = _resolve_deep(value_t, resolve)
    is_cast = fn in ("cast", "cast!", "cast_value")

    def case(expect_valid, op="validate", expected=None, expect_error=None):
        return ("case", schema_t, value_t, expect_valid, None, fail_mode,
                op, expected, expect_error, ap_opt)

    if expect == "error":
        if is_cast:
            kind = "cast" if "CastError" in pat_names else (
                "validation" if "ValidationError" in pat_names else "any")
            return case(False, "cast", None, kind)
        return case(False)
    if expect == "ok":
        if is_cast:
            # success asserted, result bound to a var — no value to compare
            return case(True, "cast", NO_EXPECTED)
        return case(True)
    if fn == "valid?":
        want = positive
        if p.at_punct("=="):  # valid?(s, v) == false / true
            p.next()
            rhs = parse_term(p)
            if isinstance(rhs, bool):
                want = rhs if positive else not rhs
            else:
                return None
        return case(want)
    if p.at_punct("=="):
        p.next()
        rhs = _resolve_deep(parse_term(p), resolve)
        if is_cast:
            if fn == "cast!" or fn == "cast_value":
                # cast!(s, v) == EXPECTED (plain value)
                return case(True, "cast", rhs)
            if isinstance(rhs, tuple) and rhs and isinstance(rhs[0], Atom):
                tag = str(rhs[0])
                if tag == "ok" and len(rhs) == 2:
                    return case(True, "cast", rhs[1])
                if tag == "error" and len(rhs) == 2:
                    err = rhs[1]
                    if isinstance(err, Call) and "CastError" in err.name:
                        return case(False, "cast", None, "cast")
                    if isinstance(err, Call) and "ValidationError" in err.name:
                        return case(False, "cast", None, "validation")
                    return None
            return None
        if isinstance(rhs, Atom) and rhs == Atom("ok"):
            return case(True)
        if isinstance(rhs, tuple) and rhs and isinstance(rhs[0], Atom) \
                and str(rhs[0]) == "error":
            return case(False)
        return None
    # bare `assert validate!(s, v)` / `cast!` (inside assert_blame) → error
    if fn == "validate!":
        return case(False)
    if fn == "cast!":
        return case(False, "cast", None, "cast")
    return None


def _resolve_deep(term, resolve):
    if isinstance(term, Var):
        return _resolve_deep(resolve(term), resolve)
    if isinstance(term, list):
        return [_resolve_deep(x, resolve) for x in term]
    if isinstance(term, tuple) and not isinstance(term, Atom):
        return tuple(_resolve_deep(x, resolve) for x in term)
    if isinstance(term, dict):
        return {k: _resolve_deep(v, resolve) for k, v in term.items()}
    if isinstance(term, KwList):
        return KwList([(k, _resolve_deep(v, resolve)) for k, v in term.items])
    return term


# ----------------------------------------------------------------------
# conversion: Elixir terms → repo DSL source / Python values
# ----------------------------------------------------------------------

XEMA_TYPES = {"any", "atom", "boolean", "float", "integer", "keyword", "list",
              "map", "nil", "number", "string", "tuple", "struct"}

_SCHEMA_SLOT = "schema"
_SCHEMA_LIST = "schema_list"
_SCHEMA_MAP = "schema_map"
_VALUE = "value"
_PLAIN = "plain"

_SLOT_KINDS = {
    "items": "items", "additional_items": _SCHEMA_SLOT, "contains": _SCHEMA_SLOT,
    "additional_properties": _SCHEMA_SLOT, "property_names": _SCHEMA_SLOT,
    "not": _SCHEMA_SLOT, "if": _SCHEMA_SLOT, "then": _SCHEMA_SLOT,
    "else": _SCHEMA_SLOT,
    "all_of": _SCHEMA_LIST, "any_of": _SCHEMA_LIST, "one_of": _SCHEMA_LIST,
    "properties": _SCHEMA_MAP, "pattern_properties": _SCHEMA_MAP,
    "definitions": _SCHEMA_MAP, "dependencies": "deps",
    "enum": _VALUE, "const": _VALUE, "default": _VALUE, "examples": _VALUE,
    "minimum": _PLAIN, "maximum": _PLAIN, "exclusive_minimum": _PLAIN,
    "exclusive_maximum": _PLAIN, "multiple_of": _PLAIN,
    "min_length": _PLAIN, "max_length": _PLAIN, "min_items": _PLAIN,
    "max_items": _PLAIN, "min_properties": _PLAIN, "max_properties": _PLAIN,
    "unique_items": _PLAIN, "format": "name", "pattern": "pattern",
    "required": "keys", "keys": "name", "ref": _PLAIN, "id": _PLAIN,
    "schema": _PLAIN, "title": _PLAIN, "description": _PLAIN,
    "module": _PLAIN, "caster": "skip", "validator": "skip",
    "allow": "allow",
}


def _merge_allow(names: list, allow: list, single: bool) -> list:
    """``allow: X`` extends the type union (xema.ex:427-443): values are
    type atoms, ``nil`` means the :nil type.  A SINGLE declared type comes
    first ([type | allow]); a declared union gets the allow values
    PREPENDED (allow ++ types)."""
    extra = []
    for a in allow:
        if a is None:
            extra.append("nil")
        elif isinstance(a, Atom) and str(a) in XEMA_TYPES:
            extra.append(str(a))
        else:
            raise Unsupported(f"allow value {a!r}")
    return names + extra if single else extra + names


def schema_to_dsl(term) -> Any:
    """Xema.new argument term → compile_schema source."""
    term = _unwrap_new(term)
    return _conv_schema(term)


def _unwrap_new(term):
    if isinstance(term, Call):
        if term.name in ("Xema.new", "new"):
            if len(term.args) == 1:
                return term.args[0]
            if len(term.args) == 2 and isinstance(term.args[1], KwList):
                opts = dict(term.args[1].items)
                if set(opts) <= {"inline", "loader"}:
                    # inline: false only changes ref STORAGE; loader is
                    # supplied by the RUNNER (test_remote_refs serves the
                    # fixture corpus over HTTP and compiles with its own
                    # loader hook)
                    return term.args[0]
                t0 = term.args[0]
                if isinstance(t0, Atom):
                    return (t0, term.args[1])
                raise Unsupported(f"Xema.new 2-arg {t0!r}")
            raise Unsupported(f"Xema.new arity {len(term.args)}")
        raise Unsupported(f"call {term.name}")
    return term


def _conv_schema(t) -> Any:
    if isinstance(t, bool):
        return t
    if t is None:
        return "nil"
    if isinstance(t, Atom):
        name = str(t)
        if name in XEMA_TYPES:
            return name if name != "nil" else "nil"
        raise Unsupported(f"schema atom :{name}")
    if isinstance(t, KwList):
        kw = _conv_kw(t.items)
        kw.pop("__allow__", None)  # :any already allows everything
        return ("any", kw)
    if isinstance(t, tuple):
        # {:type, kw...} or {[:t1, :t2], kw...} or {:type}
        if not t:
            raise Unsupported("empty tuple schema")
        head = t[0]
        if isinstance(head, Atom) and str(head) == "ref" and len(t) == 2 \
                and isinstance(t[1], str):
            return ("any", {"ref": t[1]})
        rest = list(t[1:])
        kw: dict = {}
        if rest and isinstance(rest[-1], KwList):
            kw = _conv_kw(rest[-1].items)
            rest = rest[:-1]
        if rest:
            raise Unsupported(f"tuple schema extra args {t!r:.60}")
        _MISSING = object()
        allow = kw.pop("__allow__", _MISSING)
        allow = None if allow is _MISSING else (
            allow if isinstance(allow, list) else [allow])
        if isinstance(head, Atom):
            name = str(head)
            if name == "ref" and len(t) == 2 and isinstance(t[1], str):
                return ("any", {"ref": t[1]})
            if name not in XEMA_TYPES:
                raise Unsupported(f"type atom :{name}")
            if allow is not None:
                return (_merge_allow([name], allow, single=True), kw)
            return (name, kw) if kw else name
        if isinstance(head, list):  # union type [:integer, :string]
            names = []
            for a in head:
                if a is None:
                    names.append("nil")
                elif isinstance(a, Atom) and str(a) in XEMA_TYPES:
                    names.append(str(a))
                else:
                    raise Unsupported(f"union member {a!r}")
            if allow is not None:
                names = _merge_allow(names, allow, single=False)
            return (names, kw)
        raise Unsupported(f"schema tuple head {head!r}")
    if isinstance(t, list):
        # bare union list Xema.new([:integer, :string])? keep as union
        return _conv_schema((t,))
    raise Unsupported(f"schema term {t!r}")


def _conv_kw(items) -> dict:
    out: dict = {}
    for key, val in items:
        kind = _SLOT_KINDS.get(key)
        if kind == "skip":
            raise Unsupported(f"function-valued slot {key}")
        if kind == "allow":
            out["__allow__"] = val
            continue
        if kind is None:
            # non-keyword data: schema-shaped values convert recursively
            # (pointers may target them — subSchemas.exon, nested data
            # maps in ref_test), else raw
            out[key] = _conv_data(val)
            continue
        if kind == _SCHEMA_SLOT:
            out[key] = val if isinstance(val, bool) else (
                "delete" if isinstance(val, Atom) and str(val) == "delete"
                else _conv_schema(val))
        elif kind == "items":
            if isinstance(val, list):
                out[key] = [_conv_schema(s) for s in val]
            elif isinstance(val, bool):
                out[key] = val
            else:
                out[key] = _conv_schema(val)
        elif kind == _SCHEMA_LIST:
            if not isinstance(val, list):
                raise Unsupported(f"{key} not a list")
            out[key] = [_conv_schema(s) for s in val]
        elif kind == _SCHEMA_MAP:
            if not isinstance(val, dict):
                raise Unsupported(f"{key} not a map")
            if key == "properties":
                # key KIND is semantic: Atom matches atom keys only
                conv = _conv_key
            else:
                # pattern_properties: the pattern source (regex/atom/str);
                # definitions: addressed by string JSON pointers
                def conv(k):
                    return k.pattern if isinstance(k, RegexT) else str(k)
            out[key] = {conv(k): _conv_schema(v) for k, v in val.items()}
        elif kind == "deps":
            if not isinstance(val, dict):
                raise Unsupported("dependencies not a map")
            d = {}
            for k, v in val.items():
                if isinstance(v, list) and all(
                        isinstance(x, (Atom, str)) for x in v):
                    d[_conv_key(k)] = [_conv_key(x) for x in v]
                elif isinstance(v, (Atom, str)) and not (
                        isinstance(v, Atom) and str(v) in XEMA_TYPES):
                    d[_conv_key(k)] = [_conv_key(v)]
                else:
                    d[_conv_key(k)] = _conv_schema(v)
            out[key] = d
        elif kind == _VALUE:
            out[key] = value_to_py(val)
        elif kind == "name":
            out[key] = str(val) if isinstance(val, (Atom, str)) else val
        elif kind == "pattern":
            if isinstance(val, RegexT):
                out[key] = val.pattern
            elif isinstance(val, str):
                out[key] = val
            else:
                raise Unsupported("pattern term")
        elif kind == "keys":
            if isinstance(val, list):
                out[key] = [_conv_key(v) for v in val]
            else:
                out[key] = [_conv_key(val)]
        else:  # plain
            out[key] = value_to_py(val)
    return out


def _conv_data(val):
    """Best-effort conversion of non-keyword data: nested maps recurse so
    pointer-addressable sub-schemas inside them stay compilable."""
    if isinstance(val, dict):
        return {(_conv_key(k) if isinstance(k, (Atom, str)) else k):
                _conv_data(v) for k, v in val.items()}
    try:
        return _conv_schema(val)
    except Unsupported:
        return value_to_py(val)


def _conv_key(k):
    """Map/property keys keep their kind: atoms stay Atom, strings str;
    pattern_properties regex keys become their pattern source."""
    if isinstance(k, (Atom, str)):
        return k
    if isinstance(k, RegexT):
        return k.pattern
    raise Unsupported(f"property key {k!r}")


def value_to_py(t) -> Any:
    if isinstance(t, (bool, int, float, str)) or t is None:
        return t
    if isinstance(t, Atom):
        return t
    if isinstance(t, KwList):
        return [(Atom(k), value_to_py(v)) for k, v in t.items]
    if isinstance(t, list):
        return [value_to_py(x) for x in t]
    if isinstance(t, tuple):
        return tuple(value_to_py(x) for x in t)
    if isinstance(t, dict):
        return {_freeze(k): value_to_py(v) for k, v in t.items()}
    if isinstance(t, Struct):
        out = {"__struct__": t.module}
        for k, v in t.fields:
            out[str(k)] = value_to_py(v)
        return out
    if isinstance(t, Call):
        if t.name in ("Decimal.new", "Decimal.from_float"):
            a = t.args[0]
            return Decimal(str(a))
        if t.name.endswith("String.duplicate") or t.name == "String.duplicate":
            s, n = t.args
            return str(s) * int(n)
        raise Unsupported(f"value call {t.name}")
    if isinstance(t, RegexT):
        return re.compile(t.pattern)
    if isinstance(t, SigilT):
        import datetime as dt

        if t.kind == "D":
            return dt.date.fromisoformat(t.body)
        if t.kind == "T":
            return dt.time.fromisoformat(t.body)
        if t.kind in ("N",):
            return dt.datetime.fromisoformat(t.body)
        if t.kind == "U":
            return dt.datetime.fromisoformat(t.body.replace("Z", "+00:00"))
        raise Unsupported(f"sigil ~{t.kind}")
    if isinstance(t, tuple) and t and t[0] == "range":
        return list(range(t[1], t[2] + 1))
    raise Unsupported(f"value {t!r}")


# ----------------------------------------------------------------------
# corpus assembly
# ----------------------------------------------------------------------

def load_cases(files=None, ref_dir: str = REF_DIR):
    """→ (runnable_cases, skip_notes).  runnable = (TestCase, compiled
    source, python value)."""
    out = []
    notes = []
    paths = sorted(glob.glob(os.path.join(ref_dir, "*_test.exs")))
    paths += sorted(glob.glob(os.path.join(ref_dir, "cast", "*_test.exs")))
    # remote suites need the HTTP fixture server + loader — they run in
    # tests/test_remote_refs.py, not in the loaderless default corpus
    _NEEDS_LOADER = {"ref_remote_test.exs", "ref_remote_suite_test.exs"}
    for path in paths:
        base = os.path.relpath(path, ref_dir)
        if files is not None and base not in files:
            continue
        if files is None and base in _NEEDS_LOADER:
            continue
        cases, skips = extract_file(path)
        notes.extend(skips)
        for c in cases:
            if "cast/" in path:
                c.file = "cast/" + c.file
            try:
                src = schema_to_dsl(c.schema_term)
                val = value_to_py(c.value_term)
                if c.op == "cast" and c.expected_term is not None \
                        and c.expected_term is not NO_EXPECTED:
                    c.expected_term = value_to_py(c.expected_term)
            except Unsupported as e:
                notes.append(SkipNote(c.file, f"{c.describe} / {c.test}",
                                      str(e)))
                continue
            out.append((c, src, val))
    return out, notes


if __name__ == "__main__":
    cases, notes = load_cases()
    from collections import Counter

    print(f"extracted {len(cases)} runnable cases, {len(notes)} skips")
    print(Counter(c[0].file for c in cases))
    print("--- skip reasons:")
    for reason, cnt in Counter(n.reason.split(" at ")[0] for n in notes).most_common(15):
        print(f"  {cnt:4d}  {reason}")
