"""Extractor for the reference's generated conformance corpus.

The reference generates its JSON-Schema-Test-Suite conformance tests into
very regular Elixir files (test/json_schema_test_suite/draft{4,6,7}/,
generator test/support/mix/tasks/gen/test_suite.ex).  This module parses
those files back into (schema_json, draft, data, expected_valid) triples so
the SAME corpus drives our pytest oracles — no hand-porting drift.

Only test DATA is extracted (schemas/values from the public
JSON-Schema-Test-Suite); no reference code is reused.
"""

from __future__ import annotations

import os
import re

SUITE_ROOT = "/root/reference/test/json_schema_test_suite"

_SKIP_FILES = {
    "ref_remote_test.exs",  # needs the reference's local HTTP server
}


def _elixir_term_to_python(src: str):
    """Evaluate an Elixir literal term (as emitted by the generator) as a
    Python value: %{"k" => v} maps, lists, numbers, strings, booleans, nil."""
    s = src
    s = s.replace("%{", "{")
    s = s.replace("=>", ":")
    s = re.sub(r"\bnil\b", "None", s)
    s = re.sub(r"\btrue\b", "True", s)
    s = re.sub(r"\bfalse\b", "False", s)
    return eval(s, {"__builtins__": {}}, {})  # noqa: S307 — trusted generated literals


def _matching_paren(text: str, start: int) -> int:
    """Index of the paren closing the one at ``start`` (string-aware)."""
    depth = 0
    i = start
    in_str = False
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == '"':
                in_str = False
        else:
            if ch == '"':
                in_str = True
            elif ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
                if depth == 0:
                    return i
        i += 1
    raise ValueError("unbalanced parens")


def load_cases(drafts=("draft4", "draft6", "draft7"), include_optional=False):
    """Yield (case_id, draft, schema, data, expected_valid)."""
    for draft in drafts:
        d = os.path.join(SUITE_ROOT, draft)
        if not os.path.isdir(d):
            continue
        entries = sorted(os.listdir(d))
        for fname in entries:
            if not fname.endswith(".exs") or fname in _SKIP_FILES:
                continue
            yield from _load_file(os.path.join(d, fname), draft, fname)
        if include_optional and os.path.isdir(os.path.join(d, "optional")):
            for root, _dirs, files in os.walk(os.path.join(d, "optional")):
                for fname in sorted(files):
                    if fname.endswith(".exs") and fname not in _SKIP_FILES:
                        rel = os.path.relpath(os.path.join(root, fname), d)
                        yield from _load_file(os.path.join(root, fname), draft, rel)


def _load_file(path: str, draft: str, fname: str):
    text = open(path).read()
    # split into describe blocks
    blocks = re.split(r"describe ~s\|", text)[1:]
    for bi, block in enumerate(blocks):
        name_end = block.index("|")
        desc = block[:name_end]
        # schema term: inside Xema.from_json_schema( ... , draft: ...)
        m = re.search(r"Xema\.from_json_schema\(", block)
        if not m:
            continue
        open_paren = m.end() - 1
        close = _matching_paren(block, open_paren)
        call_body = block[m.end():close]
        # strip the trailing options (", draft: ..., atom: :force")
        opt = re.search(r",\s*draft:\s*\"draft\d\"", call_body)
        schema_src = call_body[: opt.start()] if opt else call_body
        try:
            schema = _elixir_term_to_python(schema_src.strip())
        except Exception:
            continue
        # tests
        for tm in re.finditer(r"(assert|refute) valid\?\(", block):
            op = tm.group(1)
            p_open = tm.end() - 1
            p_close = _matching_paren(block, p_open)
            args = block[tm.end():p_close]
            # args = "schema, DATA"
            comma = args.index(",")
            data_src = args[comma + 1:].strip()
            try:
                data = _elixir_term_to_python(data_src)
            except Exception:
                continue
            cid = f"{draft}/{fname}:{desc[:60]}#{tm.start()}"
            yield (cid, draft, schema, data, op == "assert")
