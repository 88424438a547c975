"""Semantic string format checks (the 17 formats of reference
lib/xema/format.ex:6-24, implementations format.ex:88-501), re-expressed with
Python ``re`` + stdlib parsing.

Unsupported in the reference and here (docs/unsupported.md): ``idn-email``,
``idn-hostname``, ``iri``, ``iri-reference``.  Unknown formats are a no-op
(validator.ex:1017).

Every checker is ``str -> bool``.  Vectorized kernels reuse the pure-regex
ones directly via Arrow's ``match_substring_regex``; calendar-validated
formats (``date``, ``date_time``, ``time``) fall back to a numpy-over-matches
path in the kernel layer.
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urlsplit

# --- date / time (RFC 3339 + real calendar check, format.ex:88-145) ----

DATE_TIME_RE = re.compile(
    r"^(\d{4})-([01]\d)-([0-3]\d)[Tt]"
    r"([0-2]\d):([0-5]\d):([0-6]\d)(?:\.(\d+))?"
    r"(?:[Zz]|[-+](?:[01]\d|2[0-3]):(?:[0-5]\d|60))$"
)


def is_date_time(s: str) -> bool:
    m = DATE_TIME_RE.match(s)
    if not m:
        return False
    year, month, day, hour, minute, sec = (int(m.group(i)) for i in range(1, 7))
    try:
        # leap second "60" is accepted by the RFC grammar but not by
        # datetime; the reference's NaiveDateTime also rejects sec > 59.
        datetime(year, month, day, hour, minute, sec)
        return True
    except ValueError:
        return False


def is_time(s: str) -> bool:
    return is_date_time(f"2000-01-01T{s}")


def is_date(s: str) -> bool:
    return is_date_time(f"{s}T00:00:00.0Z")


# --- email (RFC 5322 shape, format.ex:147-180) -------------------------

EMAIL_RE = re.compile(
    r"""(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[a-z0-9!#$%&'*+/=?^_`{|}~-]+)*"""
    r"""|"(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21\x23-\x5b\x5d-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*")"""
    r"""@(?:(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"""
    r"""|\[(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"""
    r"""(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|[a-z0-9-]*[a-z0-9]:"""
    r"""(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21-\x5a\x53-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])+)\])""",
    re.IGNORECASE,
)


def is_email(s: str) -> bool:
    if s.startswith(".") or ".." in s:
        return False
    return bool(EMAIL_RE.fullmatch(s))


# --- hostname / IP (format.ex:182-290) ---------------------------------

_SUB_DOMAIN = r"[a-z\d][-a-z\d]{0,62}"
HOSTNAME_RE = re.compile(rf"^{_SUB_DOMAIN}(?:\.{_SUB_DOMAIN})*$", re.IGNORECASE)


def is_hostname(s: str) -> bool:
    return not s.endswith("-") and bool(HOSTNAME_RE.match(s))


_DEC_OCTET = r"(?:25[0-5]|2[0-4]\d|[0-1]?\d{1,2})"
IPV4_RE = re.compile(rf"^{_DEC_OCTET}(?:\.{_DEC_OCTET}){{3}}$")


def is_ipv4(s: str) -> bool:
    return bool(IPV4_RE.match(s))


_H16 = r"[0-9A-Fa-f]{1,4}"
_IPV4 = rf"{_DEC_OCTET}(?:\.{_DEC_OCTET}){{3}}"
_LS32 = rf"(?:{_H16}:{_H16}|{_IPV4})"
IPV6_RE = re.compile(
    "^(?:"
    rf"(?:{_H16}:){{6}}{_LS32}"
    rf"|::(?:{_H16}:){{5}}{_LS32}"
    rf"|(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,1}}{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(?:(?:{_H16}:){{0,6}}{_H16})?::"
    ")$"
)


def is_ipv6(s: str) -> bool:
    return bool(IPV6_RE.match(s))


def is_host(s: str) -> bool:
    return is_ipv4(s) or is_ipv6(s) or is_hostname(s)


# --- JSON pointers (format.ex:292-330) ---------------------------------

JSON_POINTER_RE = re.compile(r"^(?:/(?:[^~/]|~[01])*)*$")


def is_json_pointer(s: str) -> bool:
    return bool(JSON_POINTER_RE.match(s))


def is_relative_json_pointer(s: str) -> bool:
    if re.match(r"^\d#$", s) or re.match(r"^\d$", s):
        return True
    pre, sep, rest = s.partition("/")
    return bool(sep) and bool(re.match(r"^\d+$", pre)) and is_json_pointer(f"/{rest}")


def is_regex(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


# --- URI family (RFC 3986, format.ex:330-501) --------------------------

_PCT = r"%[0-9A-Fa-f]{2}"
URI_USERINFO_RE = re.compile(rf"^(?:[-._~a-zA-Z0-9!$&'()*+,;=:]|{_PCT})*$")
URI_QUERY_RE = re.compile(rf"^(?:[-._~a-zA-Z0-9!$&'()*+,;=:@]|{_PCT}|[/?])*$")

_PCHAR = rf"(?:[-._~a-zA-Z0-9!$&'()*+,;=@]|{_PCT})"
_SEG = rf"(?::|{_PCHAR})*"
_SEG_NZ = rf"(?::|{_PCHAR})+"
_SEG_NZ_NC = rf"{_PCHAR}+"
URI_PATH_RE = re.compile(
    rf"^(?:{_SEG_NZ}(?:/{_SEG})*|{_SEG_NZ_NC}(?:/(?:{_SEG})*)|/(?:{_SEG_NZ}(?:/{_SEG})*)?|(?:/{_SEG})*)$"
)

# URI-template path: pchar extended with {op?var-list} template expressions
_TMPL = r"\{[+#.,;?&=@!|/]?(?:(?:[_a-zA-Z0-9]|" + _PCT + r")+(?::\d+|\*)?)(?:,(?:(?:[_a-zA-Z0-9]|" + _PCT + r")+(?::\d+|\*)?))*\}"
_TPCHAR = rf"(?:[-._~a-zA-Z0-9!$&'()*+,;=@]|{_PCT}|{_TMPL})"
_TSEG = rf"(?::|{_TPCHAR})*"
_TSEG_NZ = rf"(?::|{_TPCHAR})+"
_TSEG_NZ_NC = rf"{_TPCHAR}+"
URI_TEMPLATE_PATH_RE = re.compile(
    rf"^(?:{_TSEG_NZ}(?:/{_TSEG})*|{_TSEG_NZ_NC}(?:/(?:{_TSEG})*)|/(?:{_TSEG_NZ}(?:/{_TSEG})*)?|(?:/{_TSEG})*)$"
)

_URI_HOSTNAME_SUB = r"[a-z\d][-a-z\d]*"
URI_HOSTNAME_RE = re.compile(rf"^{_URI_HOSTNAME_SUB}(?:\.{_URI_HOSTNAME_SUB})*$", re.IGNORECASE)


def _uri_hostname(s: str) -> bool:
    return not s.endswith("-") and bool(URI_HOSTNAME_RE.match(s))


def _uri_host(s: str) -> bool:
    if s.startswith("[") and s.endswith("]"):
        return is_ipv6(s[1:-1])
    return is_ipv4(s) or is_ipv6(s) or _uri_hostname(s)


def is_uri_userinfo(s: str) -> bool:
    return bool(URI_USERINFO_RE.match(s))


def is_uri_path(s: str) -> bool:
    return bool(URI_PATH_RE.match(s))


def is_uri_query(s: str) -> bool:
    return bool(URI_QUERY_RE.match(s))


def is_uri_fragment(s: str) -> bool:
    return is_uri_query(s)


def _do_uri(s: str, kind: str) -> bool:
    try:
        u = urlsplit(s)
    except ValueError:
        return False
    if kind == "uri" and not u.scheme:
        return False
    if u.scheme == "mailto":
        return is_email(u.path)
    host = u.hostname
    userinfo = u.username if u.username is not None else None
    if u.username is not None and u.password is not None:
        userinfo = f"{u.username}:{u.password}"
    if host is not None and host != "" and not _uri_host(host):
        return False
    if userinfo is not None and not is_uri_userinfo(userinfo):
        return False
    if kind == "uri_template":
        return u.path == "" or bool(URI_TEMPLATE_PATH_RE.match(u.path))
    if u.path and not is_uri_path(u.path):
        return False
    if u.query and not is_uri_query(u.query):
        return False
    if u.fragment and not is_uri_fragment(u.fragment):
        return False
    return True


def is_uri(s: str) -> bool:
    return _do_uri(s, "uri")


def is_uri_reference(s: str) -> bool:
    return _do_uri(s, "uri_reference")


def is_uri_template(s: str) -> bool:
    return _do_uri(s, "uri_template")


#: format name -> checker.  Both Xema-style snake names and JSON-Schema
#: hyphen names resolve (json_schema.ex maps "date-time" → :date_time).
CHECKERS = {
    "date": is_date,
    "date_time": is_date_time,
    "email": is_email,
    "hostname": is_hostname,
    "host": is_host,
    "ipv4": is_ipv4,
    "ipv6": is_ipv6,
    "json_pointer": is_json_pointer,
    "regex": is_regex,
    "relative_json_pointer": is_relative_json_pointer,
    "time": is_time,
    "uri": is_uri,
    "uri_fragment": is_uri_fragment,
    "uri_path": is_uri_path,
    "uri_query": is_uri_query,
    "uri_reference": is_uri_reference,
    "uri_template": is_uri_template,
    "uri_userinfo": is_uri_userinfo,
}


def normalize_format(name) -> str:
    return str(name).replace("-", "_")


def check_format(name, value: str):
    """True/False for supported formats; None (no-op) for unknown ones
    (reference validator.ex:1017)."""
    fn = CHECKERS.get(normalize_format(name))
    if fn is None:
        return None
    return fn(value)
