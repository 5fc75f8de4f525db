"""Join-shaped operators (SURVEY §2.5).

J2 resume anti-join replaces the reference's driver-side ``set``
membership test (reference: src/extractors/sequential_scraper.py:166-186,
346, 359-375); J3 merge-upsert replaces the Postgres
``INSERT ... ON CONFLICT DO UPDATE``
(reference: src/extractors/manual_scraper.py:270-290) with a
join-based MERGE usable on plain Parquet.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resume_anti_join(
    worklist: DataFrame,
    processed: DataFrame,
    key: str = "id_negocio",
    *,
    assume_small: bool = False,
) -> DataFrame:
    """J2 — rows of ``worklist`` whose key is NOT in ``processed``.

    By default the join strategy is left to Catalyst/AQE: on a
    long-lived crawl the processed-ID set is the ENTIRE history — it
    grows without bound, and an unconditional broadcast would
    eventually OOM every executor. AQE still broadcasts it while its
    runtime size is under ``spark.sql.autoBroadcastJoinThreshold``,
    so the common small case keeps the shuffle-free plan for free.

    Pass ``assume_small=True`` only when the caller KNOWS the
    processed side is bounded (e.g. a single day's checkpoint) and
    wants the broadcast guaranteed regardless of stale size stats.
    """
    processed_keys = processed.select(key).distinct()
    if assume_small:
        processed_keys = F.broadcast(processed_keys)
    return worklist.join(processed_keys, on=key, how="left_anti")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    *,
    update_cols: Sequence[str] | None = None,
    created_at_col: str | None = None,
    updated_at_col: str | None = None,
    now=None,
) -> DataFrame:
    """J3 — keyed merge: source rows replace matching target rows,
    unmatched target rows pass through (full-outer + coalesce).

    Matches the reference UPSERT semantics: updated rows keep
    ``created_at`` and refresh ``updated_at``
    (reference: src/extractors/manual_scraper.py:270-290). On a real
    deployment the result overwrites the target's affected partitions
    (dynamic partition overwrite) or becomes a Delta MERGE; the
    transform itself is storage-agnostic.
    """
    data_cols = [c for c in target.columns if c != key]
    update_cols = list(update_cols) if update_cols is not None else data_cols
    now = now if now is not None else F.current_timestamp()

    t = target.select(
        key, F.lit(True).alias("__t_exists"), *[F.col(c).alias(f"__t_{c}") for c in data_cols]
    )
    src_cols = [c for c in source.columns if c != key]
    s = source.select(
        key, F.lit(True).alias("__s_exists"), *[F.col(c).alias(f"__s_{c}") for c in src_cols]
    )

    joined = t.join(s, on=key, how="full_outer")
    matched = F.col("__s_exists").isNotNull()
    in_target = F.col("__t_exists").isNotNull()

    out = [F.col(key)]
    for c in data_cols:
        t_c, s_c = F.col(f"__t_{c}"), F.col(f"__s_{c}")
        has_source = f"__s_{c}" in joined.columns
        if c == created_at_col:
            out.append(F.coalesce(t_c, now).alias(c))
        elif c == updated_at_col:
            out.append(F.when(matched, now).otherwise(t_c).alias(c))
        elif has_source and c in update_cols:
            # a full-outer row always has at least one side, so
            # "source wins wherever it exists" is the whole rule
            out.append(F.when(matched, s_c).otherwise(t_c).alias(c))
        elif has_source:
            # column excluded from updates: existing rows keep the
            # target value, but INSERTED rows still take the source
            # value (there is no target value to preserve)
            out.append(F.when(~in_target, s_c).otherwise(t_c).alias(c))
        else:
            out.append(t_c.alias(c))
    return joined.select(*out)


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str,
    domain_col: str = "domain",
    *,
    key_col: str | None = None,
) -> DataFrame:
    """T7 at scale: drop rows whose URL host ends with any blocked
    domain. A literal OR-chain (functions.url.normalize_url) is right
    for a handful of domains; a real blocklist is a table — broadcast
    anti-join on the extracted registrable suffix.

    Matching is suffix-based on the host (www.foo.com matches foo.com)
    via an equi-joinable key: the host's last-2 and last-3 labels are
    both probed, so the join stays a hash join rather than a
    contains() nested loop.

    When the caller has a row key (``key_col`` — the reference's leads
    carry ``id_negocio``, the documents table ``doc_id``), removal is a
    key-only anti-join: the hits branch prunes to (key, url) at the
    scan, and the anti-join shuffles keys alone — document text never
    rides the shuffle. Without a key the fallback compares every
    column null-safely, which is correct but shuffles full rows keyed
    on row content; keep it for keyless inputs only.

    Keyed-path contract: ``key_col`` must identify the ROW — rows
    sharing a key are removed together when any of them hits the
    blocklist (removal is by key, deliberately). NULL keys get no such
    identity: a plain equi-join would never match them (NULL != NULL)
    and a blocked row with a NULL key would silently bypass the
    blocklist, so NULL-keyed rows are routed through the keyless
    null-safe path instead — a lazily-empty branch when every key is
    populated.
    """
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.when(n >= 2, F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)))
    last3 = F.when(
        n >= 3,
        F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)),
    )
    probes = F.array_compact(F.array(host, last2, last3))

    keys = blocked.select(F.lower(F.col(domain_col)).alias("__blocked_domain")).distinct()

    def _remove_hit_rows_nullsafe(rows: DataFrame) -> DataFrame:
        # Keyless removal: find hit ROWS via the probe semi-join, then
        # remove them with an all-columns NULL-SAFE anti-join:
        # eqNullSafe per column so a row carrying NULLs still matches
        # itself (plain equality would let it silently survive the
        # blocklist), and — unlike a generated row id — the match is
        # stable even if the two branches recompute the input with
        # different partitioning/row order.
        hits = (
            rows.withColumn("__probe", F.explode(probes))
            .join(F.broadcast(keys), F.col("__probe") == F.col("__blocked_domain"), "left_semi")
            .drop("__probe")
            .distinct()
        )
        left, right = rows.alias("l"), hits.alias("r")
        cond = None
        for c in rows.columns:
            eq = left[c].eqNullSafe(right[c])
            cond = eq if cond is None else (cond & eq)
        return left.join(right, cond, "left_anti")

    if key_col is not None:
        # Keyed path: hit KEYS via the probe semi-join (scan prunes to
        # key + url), then one key-only anti-join. AQE broadcasts the
        # hit-key set while it is small; at worst both sides shuffle
        # (key) pairs — never text. NULL-keyed rows would slip through
        # the equi-join (NULL never equals NULL), so they take the
        # null-safe row path and the results union — an empty extra
        # branch whenever keys are fully populated.
        keyed = df.filter(F.col(key_col).isNotNull())
        hit_keys = (
            keyed.select(key_col, F.explode(probes).alias("__probe"))
            .join(F.broadcast(keys), F.col("__probe") == F.col("__blocked_domain"), "left_semi")
            .select(key_col)
            .distinct()
        )
        kept = keyed.join(hit_keys, on=key_col, how="left_anti")
        return kept.unionByName(
            _remove_hit_rows_nullsafe(df.filter(F.col(key_col).isNull()))
        )
    return _remove_hit_rows_nullsafe(df)
