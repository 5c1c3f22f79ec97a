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
_HTTP_PORT_RE = re.compile(r"^(http://[^/:]+):80$")
_HTTPS_PORT_RE = re.compile(r"^(https://[^/:]+):443$")


def url_normalize(url: str) -> str:
    nofrag = re.sub(r"#.*$", "", url)
    m = _BASE_RE.match(nofrag)
    base = m.group(1) if m else ""
    rest = nofrag[len(base):]
    base = base.lower()
    base = _HTTP_PORT_RE.sub(r"\1", base)
    base = _HTTPS_PORT_RE.sub(r"\1", base)
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
