"""Executed documentation examples — the reference embeds doctests in
every public module (xema.ex:39-133 and siblings); this runs ours."""

import doctest

import xema_ray
import xema_ray.schema.declarative as declarative


def _run(module):
    result = doctest.testmod(module, verbose=False)
    assert result.attempted > 0, f"no doctests found in {module.__name__}"
    assert result.failed == 0, f"{result.failed} doctest failures in {module.__name__}"


def test_package_quickstart_doctests():
    _run(xema_ray)


def test_declarative_doctests():
    _run(declarative)
