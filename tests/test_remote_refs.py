"""Remote-$ref integration against the reference's OWN fixture corpus
(test/fixtures/remote/*.exon), served over a real localhost HTTP server —
the analogue of ref_remote_test.exs + test/support/http_server.ex.

The loaders mirror the reference's RemoteLoaderExon / FileLoader: fetch
the URI (HTTP or fixture-relative file), parse the Elixir-term schema
source with the same term parser the hand-written-suite port uses, and
hand compile_schema the converted source.
"""

import http.server
import socket
import threading

import pytest

from tests.handwritten_port import P, parse_term, schema_to_dsl, tokenize
from xema_ray.functions.scalar import Atom, is_valid
from xema_ray.schema.builder import SchemaError, compile_schema

FIXTURES = "/root/reference/test/fixtures/remote"
PORT = 1234


def _parse_exon(text: str):
    return schema_to_dsl(parse_term(P(tokenize(text))))


@pytest.fixture(scope="module")
def http_base():
    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=FIXTURES, **kw)

        def log_message(self, *a):
            pass

    try:
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", PORT), Handler)
    except OSError:
        pytest.skip(f"port {PORT} unavailable")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://localhost:{PORT}"
    srv.shutdown()


def http_loader(uri: str):
    """RemoteLoaderExon analogue: GET the source; .json bodies load as
    JSON Schema, everything else parses as an Elixir term."""
    import json as _json

    from urllib.error import HTTPError
    from urllib.request import urlopen

    try:
        with urlopen(uri, timeout=5) as r:
            body = r.read().decode()
    except HTTPError as e:
        raise KeyError(f"Remote schema {uri!r} not found.") from e
    if uri.split("#", 1)[0].endswith(".json"):
        return _json.loads(body)
    return _parse_exon(body)


def file_loader(uri: str):
    """FileLoader analogue: fixture-relative exon files."""
    import os

    path = os.path.join(FIXTURES, uri)
    if not os.path.exists(path):
        raise KeyError(uri)
    return _parse_exon(open(path).read())


def test_http_server_serves_fixture(http_base):
    from urllib.request import urlopen

    body = urlopen(f"{http_base}/folder/folderInteger.exon").read().decode()
    assert body == open(f"{FIXTURES}/folder/folderInteger.exon").read()


def test_remote_integer_ref(http_base):
    s = compile_schema({"ref": f"{http_base}/integer.exon#"}, loader=http_loader)
    assert is_valid(s, 1)
    assert not is_valid(s, "1")


def test_remote_ref_404(http_base):
    with pytest.raises(SchemaError):
        compile_schema({"ref": f"{http_base}/not-found.exon"}, loader=http_loader)


def test_remote_subschema_pointer(http_base):
    s = compile_schema({"ref": f"{http_base}/sub_schemas.exon#/definitions/int"},
                       loader=http_loader)
    assert is_valid(s, 5)
    assert not is_valid(s, "x")


def test_remote_ref_to_ref(http_base):
    # refToInt is itself {:ref, "#/definitions/int"} inside the remote doc
    s = compile_schema(
        {"ref": f"{http_base}/sub_schemas.exon#/definitions/refToInt"},
        loader=http_loader)
    assert is_valid(s, 5)
    assert not is_valid(s, "x")


def test_remote_folder_ref(http_base):
    s = compile_schema({"ref": f"{http_base}/folder/folderInteger.exon"},
                       loader=http_loader)
    assert is_valid(s, 3)
    assert not is_valid(s, 3.5)


def test_remote_object_with_nested_remote_ref(http_base):
    # obj_int.exon's property schema refs integer.exon by absolute URL
    s = compile_schema({"ref": f"{http_base}/obj_int.exon"}, loader=http_loader)
    assert is_valid(s, {Atom("int"): 5})
    assert not is_valid(s, {Atom("int"): "5"})


def test_file_circular_ref_in_sub_schema():
    # ref_remote_test.exs "file circular ref in sub schema": main.exon →
    # sub.exon → #/definitions/self (self-recursive map)
    s = compile_schema({"ref": "main.exon"}, loader=file_loader)
    a, b = Atom("a"), Atom("b")
    assert is_valid(s, {a: "a"})
    assert is_valid(s, {a: "a", b: {a: "next"}})
    assert not is_valid(s, {a: 1})
    assert not is_valid(s, {a: "a", b: {a: Atom("next")}})


def test_ref_remote_suite_extracted(http_base):
    """The machine-extracted ref_remote_suite_test.exs cases, compiled
    with the HTTP loader against the live fixture server."""
    from tests.handwritten_port import load_cases

    cases, _ = load_cases(files=["ref_remote_suite_test.exs"])
    assert len(cases) >= 12, f"only {len(cases)} remote-suite cases extracted"
    fails = []
    for c, src, val in cases:
        try:
            s = compile_schema(src, loader=http_loader)
            got = is_valid(s, val)
        except Exception as e:
            fails.append(f"{c.test}: RAISE {type(e).__name__}: {e}")
            continue
        if got != c.expect_valid:
            fails.append(f"{c.test}: got={got} want={c.expect_valid} "
                         f"src={src!r:.80} val={val!r:.40}")
    assert not fails, "\n".join(fails[:10])
