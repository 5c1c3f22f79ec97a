"""Pure-Python twin of functions.expressions.url_normalize (RFC 3986
syntax-based normalization + de-facto web rules). Same steps in the
same order; the equivalence test in tests/test_urlnorm.py runs both
forms over the same inputs. Sorting is bytewise — params are expected
ASCII (percent-encoded), matching Spark's array_sort and DuckDB's
list_sort on ASCII strings.
"""

from __future__ import annotations

import re

TRACKING_PARAM_RE = re.compile(r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)(=.*)?$")

_BASE_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]+)")
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://)")
_PORT_RE = {"http://": re.compile(r"^([^:]+):80$"),
            "https://": re.compile(r"^([^:]+):443$")}


def url_normalize(url: str) -> str:
    nofrag = re.sub(r"#.*$", "", url)
    m = _BASE_RE.match(nofrag)
    base = m.group(1) if m else ""
    rest = nofrag[len(base):]
    # Scheme and host fold to lowercase; userinfo (up to the LAST '@')
    # stays case-sensitive per RFC 3986 §6.2.2.1.
    sm = _SCHEME_RE.match(base)
    scheme = sm.group(1).lower() if sm else ""
    auth = base[len(sm.group(1)):] if sm else ""
    at = auth.rfind("@")
    userinfo = auth[:at + 1] if at >= 0 else ""
    host = auth[at + 1:].lower()
    port_re = _PORT_RE.get(scheme)
    if port_re:
        host = port_re.sub(r"\1", host)
    base = scheme + userinfo + host
    path = re.match(r"^([^?]*)", rest).group(1)
    qm = re.search(r"\?(.*)$", rest)
    query = qm.group(1) if qm else ""
    params = [p for p in query.split("&")
              if p and not TRACKING_PARAM_RE.match(p)]
    newq = "&".join(sorted(params))
    if path == "":
        path = "/"
    if newq == "" and len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return base + path + (("?" + newq) if newq else "")
