"""URL canonicalization functions (functions/urls.py)."""

from caligraph_ray.functions.urls import (canonicalize_url,
                                          registered_domain, url_host)


def test_canonicalize_strips_tracking_and_fragment():
    u = 'HTTPS://WWW.Example.COM:443/a/b/?id=7&utm_source=x&gclid=z#frag'
    assert canonicalize_url(u) == 'https://example.com/a/b?id=7'


def test_canonicalize_keeps_nondefault_port_and_param_order():
    u = 'http://host.org:8080/p?b=2&a=1&ref=abc'
    assert canonicalize_url(u) == 'http://host.org:8080/p?b=2&a=1'


def test_canonicalize_root_and_no_query():
    assert canonicalize_url('http://A.B.c/') == 'http://a.b.c'
    assert canonicalize_url('https://x.y/path') == 'https://x.y/path'


def test_host_and_domain():
    assert url_host('https://WWW.news.Site.co/x') == 'news.site.co'
    assert registered_domain('a.b.example.org') == 'example.org'
    assert registered_domain('localhost') == 'localhost'


def test_malformed_port_passthrough():
    # junk URLs in a web corpus must not kill a map_batches task: malformed
    # or out-of-range ports come back stripped-but-unchanged
    assert canonicalize_url('http://example.com:80abc/x') == \
        'http://example.com:80abc/x'
    assert canonicalize_url(' http://example.com:99999/x ') == \
        'http://example.com:99999/x'


def test_schemeless_and_malformed_inputs_pass_through():
    from caligraph_ray.functions.urls import canonicalize_url, url_host
    # scheme-less input must come back unchanged, not as '://example.com'
    assert canonicalize_url('example.com/path') == 'example.com/path'
    assert canonicalize_url('  just text  ') == 'just text'
    # malformed IPv6 must not raise (never-kill-the-task contract)
    assert url_host('http://[::1') == ''
    assert url_host('https://WWW.Example.com/x') == 'example.com'
