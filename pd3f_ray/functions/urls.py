"""URL canonicalization for web-corpus keys.

Crawl dedup and host-level aggregation key on the URL, and raw crawl
URLs carry noise that splits one logical page across many keys:
uppercase scheme/host, explicit default ports, tracking query params,
fragments, doubled path slashes. ``normalize_url`` folds those —
and ONLY those — deterministically:

- scheme and host lowercased (case-insensitive per RFC 3986 §6.2.2.1)
- default ports dropped (http:80, https:443)
- fragment dropped (never sent to the server)
- ``utm_*`` tracking params dropped, other params kept IN ORDER
  (reordering would be a semantic change for some endpoints)
- runs of ``/`` in the path collapsed; empty path → ``/``

Deliberately NOT done (lossy or server-dependent): percent-decoding,
path dot-segment resolution, trailing-slash removal, param sorting.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_SLASH_RUN = re.compile(r"/{2,}")
_DEFAULT_PORTS = {"http": 80, "https": 443}


def normalize_url(u: str) -> str:
    p = urlsplit(u.strip())
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    netloc = host
    try:
        port = p.port
    except ValueError:  # malformed port → keep the raw netloc lowercased
        return urlunsplit((scheme, p.netloc.lower(),
                           _SLASH_RUN.sub("/", p.path) or "/",
                           p.query, ""))
    if port is not None and _DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{host}:{port}"
    path = _SLASH_RUN.sub("/", p.path) or "/"
    pairs = [(k, v) for k, v in parse_qsl(p.query, keep_blank_values=True)
             if not k.lower().startswith("utm_")]
    return urlunsplit((scheme, netloc, path, urlencode(pairs), ""))


def url_host(u: str) -> str:
    """Normalized registrable host key (lowercased hostname)."""
    return (urlsplit(u.strip()).hostname or "").lower()
