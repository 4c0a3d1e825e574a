"""Core scalar column helpers re-expressing the reference's Python/SQL
scalar transforms as built-in Spark expressions (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for portable hash arithmetic: a prime below 2^31 so products with
# 32-bit coefficients stay inside int64.
HASH_PRIME = 2147483647


def bind_once(value: Column, fn) -> Column:
    """Evaluate ``value`` once per row and hand it to ``fn`` as a bound
    lambda variable — the single-element-transform idiom
    (operators.dedup.word_shingles documents the hazard): an outer-scope
    expression referenced inside a higher-order-function lambda is
    re-evaluated on EVERY element (HOF lambdas are interpreted with no
    common-subexpression cache), so e.g. an O(d) fold used inside a
    ``transform`` over the same d-element array turns O(d) work into
    O(d²). Wrapping the expression in a one-element array and binding it
    through ``transform`` makes every inner reference a cheap
    lambda-variable read; the optimizer cannot inline through a lambda
    binding, so the guarantee survives CollapseProject. Result-identical
    by construction — the same expression, evaluated once."""
    return F.transform(F.array(value), fn)[0]


def stars(rating: Column | str) -> Column:
    """Null-safe star bucketization — the reference's signature derived
    column: ``CASE WHEN ISNULL(Rating) THEN 0 ELSE FLOOR(Rating/20) END``
    (itdb2html.py:265-271; itdbloader.py:273-277). Returns LongType.
    """
    c = F.col(rating) if isinstance(rating, str) else rating
    return F.floor(F.coalesce(c, F.lit(0)) / 20)


def portable_hash64(c: Column | str) -> Column:
    """Deterministic 60-bit integer hash computable identically in Spark and
    ANSI-ish SQL (DuckDB): first 15 hex chars of md5, base-16 → int64.

    Used by MinHash/SimHash/LSH so the DuckDB oracle can reproduce bucket
    assignments exactly. (At pure-Spark scale you would use ``xxhash64`` —
    cheaper — but it has no DuckDB twin.)
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash_ranked_sample(df, id_col: str, n: int):
    """Deterministic, seedless bounded sample: the ``n`` rows with the
    smallest portable hash of their id, tie-broken by id. THE sampling
    discipline every bounded-training lever shares — train_pq,
    build_ivf_index, and the driver-side IVF-PQ trainer all call this
    one helper (code review: three hand-maintained copies could drift,
    silently breaking the distributed-vs-driver bit-identity contract
    the samplers anchor). The rank column uses a collision-proof temp
    name (ADVICE r7: a caller frame that already carried a column named
    ``h`` would have it clobbered and then dropped)."""
    tmp = "__hrs_h"
    while tmp in df.columns:  # pathological but cheap to rule out
        tmp += "_"
    return (
        df.withColumn(tmp, portable_hash64(F.col(id_col).cast("string")))
        .orderBy(tmp, id_col)
        .limit(n)
        .drop(tmp)
    )


def decode_location(location: Column | str) -> Column:
    """``file://localhost/...%20...`` iTunes Location → plain filesystem path:
    strip the scheme, URL-decode ALL %XX escapes, and unescape ``&amp;`` —
    the reference decodes generally via ``urllib.parse.unquote``
    (playlistlinks.py:268-283; itdbmetadata.py:138; orphaned_files:66-77).

    ``unquote`` semantics, not form-decoding: a literal ``+`` stays ``+``
    (protected as %2B before ``url_decode``, whose URLDecoder would turn it
    into a space), and a malformed escape (``%`` not followed by two hex
    digits) passes through as a literal ``%`` while every VALID escape in
    the same string still decodes — exactly ``unquote('%zz%20') == '%zz '``.
    That per-escape behavior comes from protecting invalid ``%`` as ``%25``
    (negative-lookahead regex) before decoding; ``try_url_decode`` +
    passthrough remains as a final net for inputs URLDecoder still rejects.
    Property-tested round-trip vs ``urllib.parse.unquote`` in
    tests/test_properties.py (well-formed AND mixed valid+invalid)."""
    c = F.col(location) if isinstance(location, str) else location
    path = F.regexp_replace(c, r"^file://localhost", "")
    path = F.regexp_replace(path, r"&amp;", "&")
    protected = F.regexp_replace(path, r"\+", "%2B")
    protected = F.regexp_replace(protected, r"%(?![0-9A-Fa-f]{2})", "%25")
    return F.coalesce(F.try_url_decode(protected), path)


def ms_to_hms(ms: Column | str) -> Column:
    """Milliseconds → ``h:mm:ss`` with no leading zero hours, as rendered by
    the reference (itdb2html.py:124-131). Pure integer arithmetic so the SQL
    oracle can mirror it exactly.

    A duration is nonnegative by definition; negative input clamps to 0
    (the reference only ever renders track times). Unclamped, Spark's
    truncating casts and a floor-based SQL mirror disagree sign-place by
    sign-place ('0:00:-2' vs '-1:-1:-3' — both garbage; caught by the
    edge-corpus audit's negative value). The clamp is NULL-preserving:
    an unknown duration stays NULL rather than rendering as a genuine
    '0:00:00' (greatest() would coerce — it skips NULLs on both
    engines)."""
    raw = (F.col(ms) if isinstance(ms, str) else ms).cast("long")
    c = F.when(raw < 0, F.lit(0).cast("long")).otherwise(raw)
    secs = (c / 1000).cast("long")
    h = (secs / 3600).cast("long")
    m = ((secs % 3600) / 60).cast("long")
    s = secs % 60
    return F.concat(
        h.cast("string"),
        F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"),
    )


def sanitize_filename(name: Column | str) -> Column:
    """Whitelist ``[A-Za-z0-9-_.]``, everything else → ``_``; empty/null →
    ``_NONE_`` (itdb2html.py:63-71)."""
    c = F.col(name) if isinstance(name, str) else name
    cleaned = F.regexp_replace(F.coalesce(c, F.lit("")), r"[^A-Za-z0-9\-_.]", "_")
    return F.when(F.length(cleaned) == 0, F.lit("_NONE_")).otherwise(cleaned)


def m3u_line(path: Column, name: Column, seconds: Column) -> Column:
    """One ``#EXTINF``-style m3u entry line; the reference writes
    ``#ITDBDESC``/``#ITDBFILE`` header comments plus one decoded Location per
    line (templates/filelist.tmpl.m3u:1-4; playlistlinks.py:254-265)."""
    return F.concat(
        F.lit("#EXTINF:"),
        seconds.cast("long").cast("string"),
        F.lit(","),
        name,
        F.lit("\n"),
        path,
    )
