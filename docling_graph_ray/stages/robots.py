"""Robots-style path-prefix disallow filtering for crawl urls.

Crawl-politeness companion to the UT1-style domain blocklist
(stages/urlfilter.py): where the blocklist kills whole registrable
domains, robots rules disallow PATH PREFIXES per host (the robots.txt
``Disallow:`` semantic, applied at corpus-filter time).  Rules are a
true dimension (a site's robots file is small by contract) broadcast
once via ``ray.put``; the scan is an embarrassingly-parallel per-batch
pass — host parse, per-host rule lookup, longest-matching-prefix wins.

Rule form: ``(host_glob, path_prefix)`` where host_glob is either an
exact host or ``"*"`` (all hosts).  The most specific match (longest
path_prefix; exact host beats ``"*"`` at equal length) names the
blocking rule; unmatched urls pass with a null rule.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = re.compile(r"^https?://([^/]+)(/.*)?$")

ANNOT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("path", pa.string()),
    ("blocked_by", pa.string()),
    ("allowed", pa.bool_()),
])


def robots_annotate(pages, rules: list[tuple[str, str]], *,
                    url_col: str = "url"):
    """Annotate every url with its most specific disallow match (or
    null).  ``rules`` broadcast once; per batch the work is one regex
    parse + a per-host prefix scan over the handful of applicable
    rules."""
    import ray

    rules_ref = ray.put(list(rules))

    def annotate(b: pa.Table) -> pa.Table:
        rl = ray.get(rules_ref)
        urls = b.column(url_col).to_pylist()
        hosts, paths, blocked = [], [], []
        for u in urls:
            m = _URL_RE.match(u or "")
            host = m.group(1) if m else ""
            path = (m.group(2) or "/") if m else ""
            best = None  # (path_len, host_exact, rule_name)
            for rh, rp in rl:
                if (rh == "*" or rh == host) and path.startswith(rp):
                    key = (len(rp), 1 if rh != "*" else 0)
                    if best is None or key > best[0]:
                        best = (key, f"{rh}:{rp}")
            hosts.append(host)
            paths.append(path)
            blocked.append(best[1] if best else None)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "path": pa.array(paths, pa.string()),
            "blocked_by": pa.array(blocked, pa.string()),
            "allowed": pa.array([x is None for x in blocked]),
        }).cast(ANNOT_SCHEMA)

    return pages.map_batches(annotate, batch_format="pyarrow")
