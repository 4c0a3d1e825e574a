"""Templated HTML report sink.

The reference renders Cheetah templates from fetched rows and caches the
files (itdb2html.py:205-216, :343-349, :436-443; templates/stats.tmpl.html)
— rendering is inherently driver-side, so the engine contract is: the
DataFrame computes the (small, aggregated) report data; this module
collects and renders it, with the reference's file-cache semantics
(itdb2html.py:352-365, :612-625)."""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html><head><title>{title}</title></head>
<body>
<h1>{title}</h1>
<table>
<tr>{header}</tr>
{rows}
</table>
</body></html>
"""


def render_stats_page(df: DataFrame, title: str) -> str:
    """Render an aggregate DataFrame (post-groupBy: small by construction)
    as the stats table page. Columns render in DataFrame order; values are
    HTML-escaped; a `sortvalue` attribute mirrors the reference's
    client-side sortable tables (html/tablesort.js:7-9)."""
    cols = df.columns
    header = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = []
    for r in df.collect():
        cells = []
        for c in cols:
            v = r[c]
            sv = f' sortvalue="{v}"' if isinstance(v, (int, float)) else ""
            cells.append(f"<td{sv}>{html.escape('' if v is None else str(v))}</td>")
        body.append("<tr>" + "".join(cells) + "</tr>")
    return _PAGE.format(title=html.escape(title), header=header, rows="\n".join(body))


def write_cached_page(
    df: DataFrame, title: str, path: str, use_cache: bool = True
) -> tuple[str, bool]:
    """File-existence cache probe (itdb2html.py:612-625): return the cached
    file untouched when present and caching is on; otherwise render and
    write. Returns (path, was_cache_hit)."""
    if use_cache and os.path.exists(path):
        return path, True
    content = render_stats_page(df, title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)
    return path, False


def clear_cache(cache_dir: str) -> int:
    """Whole-cache invalidation on reload (`ClearCache`, itdb2html.py:
    352-365) — with the reference's refuse-to-rm-/ guard."""
    assert cache_dir not in ("/", ""), "refusing to clear filesystem root"
    n = 0
    if os.path.isdir(cache_dir):
        for name in os.listdir(cache_dir):
            if name.endswith(".html"):
                os.remove(os.path.join(cache_dir, name))
                n += 1
    return n
