"""URL canonicalization for the crawl frontier (graft op, SURVEY.md §2.3).

From-scratch per BASELINE.json north_rule: RFC 3986 normalize +
lowercase host + strip fragment.  This is the *crawl* normalizer; the
extraction-side href absolutizer (reference-exact, leaves bare relative
paths alone) lives in ``table.URLConverter``.

Pure functions -> property-testable, and vectorizable over pandas
Series inside Arrow UDF batches.
"""

from __future__ import annotations

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

    # dot-segment removal (RFC 3986 §5.2.4 verbatim -- posixpath.normpath
    # is NOT equivalent: it drops the trailing slash of "/a/." and
    # special-cases a leading "//", so equivalent URLs would get
    # distinct seen-set keys) + percent-encoding normalization
    path = _remove_dot_segments(path) if path else "/"
    if not path:
        path = "/"
    path = quote(unquote(path), safe=_PATH_SAFE)
    if not path.startswith("/"):
        path = "/" + path
    query = quote(unquote(query), safe=_QUERY_SAFE) if query else ""

    return urlunsplit((scheme, netloc, path, query, ""))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments.  Preserves the trailing
    slash of "/a/." (-> "/a/") and duplicate slashes ("/a//b"), unlike
    posixpath.normpath."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


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
