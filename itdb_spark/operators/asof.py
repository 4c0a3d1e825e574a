"""Two-table as-of join — the merge_asof operation (pandas.merge_asof,
kdb+ aj): for every left row, attach the payload of the latest right row
of the same key whose timestamp is at or before (backward, the default)
the left row's timestamp.

Spark has no native as-of join (SURVEY.md §2.3: the reference has none
either — its playlist/track joins are all equality). The scalable form
here is the UNION-TAG pattern, not a join at all:

1. tag both inputs with a side marker and align their schemas (each
   side's payload packed into ONE nullable struct, null on the other
   side's rows);
2. union them — no shuffle yet, unions are free;
3. one window per key ordered by (ts, side): ``last(right_payload,
   ignorenulls=true)`` over rows UNBOUNDED PRECEDING..CURRENT carries
   the most recent right payload forward into every left row;
4. keep the left rows and flatten both structs.

Cost: exactly ONE exchange (hash partition on the key for the window)
plus a per-partition sort — the same price as a plain groupBy over the
combined input, with no join, no broadcast, and no range explosion. A
sort-merge join formulation would shuffle BOTH tables and then still
need per-key ordered deduplication; ``applyInPandas`` (a literal
merge_asof per key group) leaves the JVM. At 100 TB the window form
scales like any keyed aggregation: skew follows the key distribution
(salt upstream if one user dominates), and ordering is per-key only —
no global sort.

Tie semantics: at equal timestamps the right row sorts BEFORE the left
row (side 0 < 1), so backward matches are INCLUSIVE (ts_right <= ts_left),
matching pandas.merge_asof(allow_exact_matches=True) and DuckDB
``ASOF JOIN ... ON l.ts >= r.ts`` — which makes DuckDB's independent
ASOF implementation usable as the differential oracle. ``strict=True``
flips the side order so equal-ts right rows are excluded
(allow_exact_matches=False). Right rows must be unique per (key, ts) —
pre-aggregate duplicates (the registered query takes max(event_id)); with
duplicates the carried row is the union's nondeterministic tie order.

NULL semantics (SQL-join-compatible, so the DuckDB ASOF oracle agrees):
right rows with a NULL timestamp or NULL key are dropped up front — a
NULL key never equals anything and a NULL timestamp has no position on
the axis; left rows always survive (left-join), and a NULL-ts or
NULL-key left row matches nothing (NULL-keyed left rows share a window
partition with each other, but that partition contains no right rows
after the filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    strict: bool = False,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of LEFT join: every left row, plus the payload columns of the
    nearest right row per key — the latest with ``right_ts <= left_ts``
    (``backward``, default), the earliest with ``right_ts >= left_ts``
    (``forward``), or whichever of those two is closer in absolute
    distance (``nearest``, ties resolve backward — pandas
    merge_asof(direction='nearest') semantics; adds a ``matched_dir``
    column naming the winning side). strict excludes the equal-ts match
    (backward/forward only). Nulls when no right row qualifies.

    Forward is the same one-exchange union-tag plan with the window
    frame flipped: first non-null right payload over
    [CURRENT ROW, UNBOUNDED FOLLOWING] instead of last over
    [UNBOUNDED PRECEDING, CURRENT ROW], and the equal-ts side order
    inverted (a following frame includes the current row, so inclusive
    forward needs right rows sorting AFTER the left row at equal ts).

    ``tolerance`` (pandas merge_asof parity) caps the match distance in
    the EXACT linearized units of the timestamp type — integer
    microseconds for timestamps, days for dates, native arithmetic for
    numerics. A candidate farther than tolerance is ineligible (NULLs if
    nothing closer qualifies); for ``nearest`` the eligibility filter
    applies per side BEFORE the nearer-wins comparison, so a nearer but
    out-of-tolerance side loses to a farther in-tolerance one — pandas'
    rule. NULL distances are ineligible by construction.

    All non-key right columns (including ``right_ts``) are carried;
    rename them before the call if they collide with left column names.
    Output columns: every left column, then the right payload columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and strict:
        raise ValueError("strict nearest is not defined (no equal-ts side to exclude)")
    if tolerance is not None and tolerance < 0:
        # pandas merge_asof parity: a negative tolerance is always a
        # caller bug (it silently unmatches every row — dist <= tolerance
        # is false for all non-negative distances), so fail loud like
        # pandas does instead of returning an all-NULL payload.
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    keys = [on] if isinstance(on, str) else list(on)
    l_payload = [c for c in left.columns if c not in keys]
    r_payload = [c for c in right.columns if c not in keys]
    overlap = set(l_payload) & set(r_payload)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {sorted(overlap)}")
    if direction == "nearest" and "matched_dir" in (*l_payload, *r_payload):
        raise ValueError(
            "rename the matched_dir column: nearest direction appends its own"
        )

    l_struct_t = left.select(F.struct(*l_payload).alias("s")).schema[0].dataType
    r_struct_t = right.select(F.struct(*r_payload).alias("s")).schema[0].dataType

    # A right row with a NULL timestamp or NULL key can never be a
    # DEFINED match: SQL equality joins (the DuckDB ASOF oracle) never
    # match NULL keys, and a NULL timestamp has no position on the time
    # axis — without this filter a nulls-first NULL-ts row becomes the
    # backward candidate whose NULL distance makes nearest's comparison
    # null-propagate and silently beat a real finite-distance match
    # (caught by review, confirmed by execution). Left rows with NULL
    # keys keep left-join semantics: their partition simply contains no
    # right rows.
    defined = F.col(right_ts).isNotNull()
    for k in keys:
        defined = defined & F.col(k).isNotNull()
    right = right.where(defined)

    # Equal-ts ordering decides exact-match inclusivity relative to the
    # frame: a PRECEDING frame sees right rows sorting at-or-before the
    # left row, a FOLLOWING frame sees ones sorting at-or-after — so the
    # side assignment inverts with the direction.
    backward = direction == "backward"
    if direction == "nearest":
        # right rows sort before left at equal ts: the PRECEDING frame
        # (backward candidate) sees exact matches, so a distance-0 tie
        # always resolves to the backward side below.
        r_side, l_side = 0, 1
    elif backward:
        r_side, l_side = (2, 1) if strict else (0, 1)
    else:
        r_side, l_side = (0, 1) if strict else (2, 1)
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.struct(*l_payload).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )
    # EXACT linearization of the ts type for distance arithmetic
    # (nearest's comparison and tolerance's cap): timestamps as integer
    # microseconds (a double cast would be micros/1e6 — seconds — which
    # is NOT exactly representable, and a rounding wobble on an
    # exact-distance tie would flip the documented backward preference),
    # dates as integer days, numerics native.
    from pyspark.sql import types as T

    ts_type = left.schema[left_ts].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        lin = F.unix_micros
    elif isinstance(ts_type, T.DateType):
        lin = F.unix_date
    else:
        lin = lambda c: c  # noqa: E731 — numeric: exact native compare

    base = Window.partitionBy(*keys).orderBy("_ts", "_side")
    if direction == "nearest":
        # BOTH frames over the one sorted partition — same single
        # exchange + sort as one direction (two Window nodes share the
        # required distribution/ordering, Catalyst inserts no second
        # Exchange); the nearer candidate wins, distance ties go
        # backward (pandas merge_asof direction='nearest' semantics).
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = tagged_l.unionByName(tagged_r).select(
            *keys,
            "_side",
            "_ts",
            "_l",
            F.last("_r", ignorenulls=True).over(wb).alias("_rb"),
            F.first("_r", ignorenulls=True).over(wf).alias("_rf"),
        )
        t0 = lin(F.col("_ts"))
        # backward candidate is <= t0 and forward is > t0 by the sort
        # order, so plain differences are the absolute distances
        db = t0 - lin(F.col("_rb").getField(right_ts))
        df_ = lin(F.col("_rf").getField(right_ts)) - t0
        if tolerance is not None:
            # out-of-tolerance distance → NULL → that side ineligible
            db = F.when(db <= F.lit(tolerance), db)
            df_ = F.when(df_ <= F.lit(tolerance), df_)
        # eligibility is distance-definedness: a NULL candidate (or one
        # capped out by tolerance) has a NULL distance
        rb_ok, rf_ok = db.isNotNull(), df_.isNotNull()
        pick_f = (~rb_ok & rf_ok) | (rb_ok & rf_ok & (df_ < db))
        # A NULL-ts LEFT row has no defined distance to anything → no
        # match (mirrors the right-side filter above).
        chosen = (
            F.when(t0.isNull() | (~rb_ok & ~rf_ok), F.lit(None).cast(r_struct_t))
            .when(pick_f, F.col("_rf"))
            .otherwise(F.col("_rb"))
        )
        matched = (
            F.when(chosen.isNull(), F.lit(None).cast("string"))
            .when(pick_f, F.lit("forward"))
            .otherwise(F.lit("backward"))
        )
        return carried.where(F.col("_side") == l_side).select(
            *keys,
            *[F.col(f"_l.{c}").alias(c) for c in l_payload],
            *[chosen.getField(c).alias(c) for c in r_payload],
            matched.alias("matched_dir"),
        )
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("_r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("_r", ignorenulls=True).over(w)
    carried = tagged_l.unionByName(tagged_r).select(
        *keys,
        "_side",
        "_ts",
        "_l",
        # NULL-ts left rows match nothing in either direction: they sort
        # nulls-first, which backward's PRECEDING frame already maps to
        # no-candidate, but forward's FOLLOWING frame would hand them the
        # first real right row with an undefined distance.
        F.when(F.col("_ts").isNull(), F.lit(None).cast(r_struct_t))
        .otherwise(carry)
        .alias("_r"),
    )
    if tolerance is not None:
        t0 = lin(F.col("_ts"))
        rts = lin(F.col("_r").getField(right_ts))
        dist = (t0 - rts) if backward else (rts - t0)
        carried = carried.withColumn(
            "_r", F.when(dist <= F.lit(tolerance), F.col("_r"))
        )
    return carried.where(F.col("_side") == l_side).select(
        *keys,
        *[F.col(f"_l.{c}").alias(c) for c in l_payload],
        *[F.col(f"_r.{c}").alias(c) for c in r_payload],
    )
