"""URL canonicalization properties (graft op, SURVEY.md §2.3)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from rsoup_spark.functions.urlnorm import canonicalize_url, url_host


def test_basic_rules():
    c = canonicalize_url
    assert c("HTTP://Example.COM/a/b") == "http://example.com/a/b"
    assert c("https://example.com:443/x") == "https://example.com/x"
    assert c("http://example.com:80/x") == "http://example.com/x"
    assert c("http://example.com:8080/x") == "http://example.com:8080/x"
    assert c("https://example.com") == "https://example.com/"
    assert c("https://example.com/a/../b") == "https://example.com/b"
    assert c("https://example.com/a/./b/") == "https://example.com/a/b/"
    assert c("https://example.com/x#frag") == "https://example.com/x"
    assert c("https://example.com/%7Euser") == "https://example.com/~user"
    assert c("https://user:pw@example.com/x") == "https://example.com/x"
    assert c("ftp://example.com/x") is None
    assert c("javascript:alert(1)") is None
    assert c("mailto:x@y.z") is None
    assert c("") is None
    assert c(None) is None


def test_rfc3986_dot_segments():
    """remove_dot_segments cases posixpath.normpath gets wrong."""
    c = canonicalize_url
    # trailing '/.' and '/..' preserve the directory slash (RFC 5.2.4)
    assert c("http://h.test/a/.") == "http://h.test/a/"
    assert c("http://h.test/a/") == "http://h.test/a/"
    assert c("http://h.test/a/b/..") == "http://h.test/a/"
    # duplicate slashes are NOT collapsed (distinct URIs per RFC)
    assert c("http://h.test//double//slash") == "http://h.test//double//slash"
    # leading '..' segments above root are dropped
    assert c("http://h.test/../x") == "http://h.test/x"
    assert c("http://h.test/a/../../x") == "http://h.test/x"


def test_relative_resolution():
    base = "https://site0.test/page/3"
    assert canonicalize_url("/page/7", base) == "https://site0.test/page/7"
    assert canonicalize_url("./7", base) == "https://site0.test/page/7"
    assert canonicalize_url("//site1.test/p", base) == "https://site1.test/p"
    assert canonicalize_url("other", base) == "https://site0.test/page/other"
    assert canonicalize_url("?q=1#f", base) == "https://site0.test/page/3?q=1"


def test_variants_collapse():
    # fragment/case/port/dot-segment variants of one target must collapse
    variants = [
        "https://Site0.TEST/page/7",
        "https://site0.test:443/page/7",
        "https://site0.test/page/7#section",
        "https://site0.test/page/x/../7",
        "https://site0.test/./page/7",
    ]
    forms = {canonicalize_url(v) for v in variants}
    assert forms == {"https://site0.test/page/7"}


@given(
    host=st.from_regex(r"[a-z][a-z0-9]{0,10}\.(test|com|org)", fullmatch=True),
    segs=st.lists(st.from_regex(r"[A-Za-z0-9._~-]{1,8}", fullmatch=True), max_size=4),
    frag=st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True),
)
@settings(max_examples=150, deadline=None)
def test_idempotent_and_fragment_free(host, segs, frag):
    url = f"https://{host}/" + "/".join(segs) + (f"#{frag}" if frag else "")
    c1 = canonicalize_url(url)
    assert c1 is not None
    # idempotent
    assert canonicalize_url(c1) == c1
    # no fragment survives
    assert "#" not in c1
    assert url_host(c1) == host
