"""URL canonicalization for the crawl frontier (graft op, SURVEY.md §2.3).

From-scratch per BASELINE.json north_rule: RFC 3986 normalize +
lowercase host + strip fragment.  This is the *crawl* normalizer; the
extraction-side href absolutizer (reference-exact, leaves bare relative
paths alone) lives in ``table.URLConverter``.

Pure functions -> property-testable, and vectorizable over pandas
Series inside Arrow UDF batches.
"""

from __future__ import annotations

import posixpath
from typing import Optional
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# characters that stay unescaped in paths/queries after re-quoting
_PATH_SAFE = "/:@!$&'()*+,;=~-._"
_QUERY_SAFE = "=&/:@!$'()*+,;?~-._"


def canonicalize_url(url: str, base: Optional[str] = None) -> Optional[str]:
    """Canonical form of ``url`` (resolved against ``base`` if relative).

    Rules (north_rule): resolve relative references per RFC 3986; scheme
    and host lowercased; default port stripped; dot-segments removed;
    percent-encoding normalized (unreserved chars decoded, everything
    re-quoted uppercase); empty path -> "/"; fragment stripped.  Returns
    None for non-http(s) or unparseable URLs.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return None
    scheme = scheme.lower()
    if scheme not in ("http", "https"):
        return None

    host, sep, port = netloc.lower().rpartition(":")
    if sep and port.isdigit():
        if port == _DEFAULT_PORTS.get(scheme):
            netloc = host
        else:
            netloc = f"{host}:{port}"
    else:
        netloc = netloc.lower()
    if "@" in netloc:  # strip credentials: crawlers never keep them
        netloc = netloc.rpartition("@")[2]
    if not netloc:
        return None

    # dot-segment removal + percent-encoding normalization
    path = posixpath.normpath(path) if path else "/"
    if path == ".":
        path = "/"
    # normpath collapses trailing "/" -- put it back (semantic on the web)
    if url_path_had_trailing_slash(url) and not path.endswith("/"):
        path += "/"
    path = quote(unquote(path), safe=_PATH_SAFE)
    if not path.startswith("/"):
        path = "/" + path
    query = quote(unquote(query), safe=_QUERY_SAFE) if query else ""

    return urlunsplit((scheme, netloc, path, query, ""))


def url_path_had_trailing_slash(url: str) -> bool:
    try:
        p = urlsplit(url).path
    except ValueError:
        return False
    return p.endswith("/") and p != "/"


def url_host(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants); used to
    derive k Bloom probe positions from one 64-bit URL hash so the heavy
    hashing stays JVM-side (xxhash64 column)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)
