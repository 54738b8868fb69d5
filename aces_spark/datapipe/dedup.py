"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed for 100 TB corpora:

* **exact** — hash-groupBy on a content fingerprint; one shuffle keyed by
  the digest (uniform keys, no skew).
* **n-gram Jaccard** — inverted-index join: explode word shingles, drop
  ultra-common shingles (a document-frequency cap kills the quadratic
  blowup on boilerplate), self-join on shingle, group by pair. Shuffle is
  keyed by shingle digest; the DF cap bounds per-key fanout.
* **MinHash-LSH** — b×r banded signatures from md5-derived hash values
  (deterministic, engine-portable), candidate pairs from band-bucket
  groupBy. Linear in corpus size; only same-bucket pairs are compared.
* **SimHash** — 32-bit signature from per-token md5 bits; near-dups are
  pairs within Hamming distance k found by block rotation
  (:func:`simhash_near_pairs`): split the signature into k+1 blocks —
  any pair at distance ≤ k agrees exactly on ≥ 1 block (pigeonhole), so
  bucketing on (block, value) finds EVERY such pair; verify with
  ``bit_count(a ^ b)``. :func:`simhash_dup_groups` is the cheaper
  exact-signature bucket stage.

Everything is Column-expression-only (no Python UDFs); md5 is used as the
portable hash everywhere so a DuckDB oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, norm_tokens


# shared tokenizer lives in text.py; kept under the old private name for
# this module's call sites
_norm_tokens = norm_tokens


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Explode each document into its distinct word n-gram shingles:
    ``(doc_id, shingle)``."""
    tokens = _norm_tokens(text_col)
    # guard: Spark sequence(0, negative) counts DOWN — docs shorter than n
    # tokens must yield no shingles, not a descending index range
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(0), F.size(tokens) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    return df.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact (normalized) duplicate groups: fingerprint → group → keep the
    min doc_id as canonical. Returns
    ``(fingerprint, n_dups, canonical_doc_id)`` for groups with ≥2 docs."""
    fp = fingerprint(df, text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def _capped_hashed_shingles(
    df: DataFrame,
    n: int,
    text_col: str,
    max_doc_freq: int | None,
    cache_registry: list | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the shingle-overlap operators
    (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`): the hashed,
    boilerplate-capped, persisted ``(doc_id, shingle)`` relation and the
    per-doc shingle sizes.

    The shingle string never reaches any output — only pair counts do —
    so it collapses to a 64-bit hash immediately: ~5× less shuffle volume
    through the cap aggregate and the self-join, with collision odds
    ~|shingles|²/2⁶⁴ (immaterial to an overlap estimate at any corpus
    size). The DuckDB oracles keep string shingles; results agree because
    the key is internal. The boilerplate cap is a broadcast ANTI-join:
    the over-cap shingle list is tiny by definition (each member appears
    in >max_doc_freq docs, so there can be at most
    |corpus·shingles|/max_doc_freq of them), and the partial-aggregated
    groupBy + broadcast anti-join avoids the full sort-shuffle a
    count-over-shingle window pays (measured 2.5× faster at sf0.1). The
    relation feeds three consumers (both join sides + the size agg), so
    it is persisted; the CALLER owns the lifecycle (``cache_registry``).
    """
    sh = word_shingles(df, n, text_col).select(
        "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
    )
    if max_doc_freq is not None:
        # persist the RAW hashed relation first: the cap's doc-frequency
        # aggregate and the anti-join left side are two consumers of the
        # same tokenize+shingle+explode pipeline — without this the whole
        # string-heavy map pass runs TWICE (the r10 plan ledger shows two
        # Generate subtrees inside the cached relation build; guide §2.4:
        # don't recompute what two consumers can share). The raw→capped
        # delta is only the boilerplate rows, so this is the same
        # memory-class persist the capped relation already paid.
        sh = sh.persist()
        if cache_registry is not None:
            cache_registry.append(sh)
        heavy = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(heavy), "shingle", "left_anti")
    sh = sh.persist()
    if cache_registry is not None:
        cache_registry.append(sh)
    # sizes feeds BOTH size joins (n_a and n_b) downstream: persist (same
    # registry lifecycle as sh) so the per-doc count aggregate runs once
    # per job, not per side — persist rather than localCheckpoint because
    # the scoped wrappers must be able to release it on exit
    sizes = (
        sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles")).persist()
    )
    if cache_registry is not None:
        cache_registry.append(sizes)
    return sh, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_doc_freq: int | None = 1000,
    cache_registry: list | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs by word-n-gram Jaccard similarity via
    an inverted-index self-join. Returns ``(doc_a, doc_b, jaccard)`` with
    ``doc_a < doc_b`` and ``jaccard ≥ threshold`` (rounded to 4 dp).

    ``max_doc_freq`` drops shingles shared by more than that many documents
    — the boilerplate guard that keeps the join linear at corpus scale.

    Caching note: the shingle relation is persisted (it feeds both join
    sides and the size aggregate inside ONE job) and the caller owns the
    lifecycle — there is no safe point to unpersist inside this function
    because the returned plan is lazy. Pass ``cache_registry=[]`` to
    receive the persisted DataFrame(s) and ``unpersist()`` them after the
    result is materialized, or use :func:`scoped_ngram_jaccard_pairs`
    which does exactly that. Without either, Spark's LRU
    (MEMORY_AND_DISK) or ``spark.catalog.clearCache()`` reclaims it.
    """
    sh, sizes = _capped_hashed_shingles(df, n, text_col, max_doc_freq, cache_registry)

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )

    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    # basis-point floor rule, not ROUND: a jaccard is a small-integer ratio
    # and CAN land exactly on a half boundary (e.g. 1/32 = 0.03125), where
    # HALF_UP (Spark) and an oracle engine's rounding diverge; floor(x*1e4
    # + 0.5) is identical everywhere (same rule as paragraph/quality stats)
    jac_bp = F.floor(jac * 10000 + 0.5) / 10000

    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac_bp.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_doc_freq: int | None = 1000,
    cache_registry: list | None = None,
) -> DataFrame:
    """DIRECTED near-duplicate pairs by one-sided shingle containment
    ``|A ∩ B| / |A|`` — the subset-duplicate detector Jaccard misses: a
    short document quoted whole inside a long one has tiny Jaccard (the
    union is dominated by the long doc) but containment ≈ 1. This is the
    asymmetric half of the classic resemblance/containment pair
    (Broder's syntactic-similarity formulation). Returns
    ``(doc_a, doc_b, containment)`` where ``doc_a`` is the CONTAINED
    document, both directions are evaluated, and
    ``containment ≥ threshold`` (basis-point floor rounding).

    Scale shape: identical to :func:`ngram_jaccard_pairs` — one hashed,
    boilerplate-capped inverted-index self-join (never a cartesian), the
    unordered pair counted ONCE and fanned to its two directions before
    the size join. Same ``cache_registry`` lifecycle contract.
    """
    sh, sizes = _capped_hashed_shingles(df, n, text_col, max_doc_freq, cache_registry)

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("__lo"), F.col("b.doc_id").alias("__hi"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        # both union branches read this relation — without lineage
        # truncation Catalyst replays the whole inverted-index join per
        # branch (measured 6.8 s vs 3.7 s for the jaccard sibling)
        .localCheckpoint(eager=False)
    )
    directed = common.select(
        F.col("__lo").alias("doc_a"), F.col("__hi").alias("doc_b"), "n_common"
    ).union(
        common.select(
            F.col("__hi").alias("doc_a"), F.col("__lo").alias("doc_b"), "n_common"
        )
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cont_bp = F.floor(F.col("n_common") / F.col("n_a") * 10000 + 0.5) / 10000
    return (
        directed.join(sa, "doc_a")
        .select("doc_a", "doc_b", cont_bp.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    window: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Char-level rolling-window exact-substring dedup — the finer-grained
    sibling of :func:`paragraph_dedup_stats` (Lee et al. 2022 find exact
    duplicated *substrings*, not just whole paragraphs; a fixed ``window``
    with ``stride`` overlap approximates their suffix-array pass with pure
    relational ops). A window is *duplicated* if its 128-bit fingerprint (two-seed
    xxhash64 struct) occurs in more than one document, or more than once within this document.

    Returns ``(doc_id, n_windows, n_dup_windows, dup_win_frac)`` for every
    document with at least one full window (``length >= window``);
    ``dup_win_frac`` is in exact basis points (``floor(x*1e4 + 0.5)/1e4``).

    Scale shape: explode window positions (narrow), ONE exchange keyed by
    the 16-byte window fingerprint (uniform hash keys), then a doc-keyed rollup — the
    same linear two-aggregate plan as paragraph dedup, never a self-join.
    With ``stride = window/2`` every duplicated run ≥ 1.5×window chars is
    guaranteed to contain a duplicated window.
    """
    docs = df.filter(F.length(F.col(text_col)) >= window)
    # number of stride-aligned windows that fit: (len - window) // stride + 1
    # — integer `div`, so the docstring formula holds by construction (a
    # double division is exact for realistic lengths but not by-definition)
    n_win = F.expr(f"(length(`{text_col}`) - {int(window)}) div {int(stride)}") + 1
    pos = docs.select(
        "doc_id",
        F.col(text_col).alias("__t"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_win - 1)).alias("__i"),
    )
    # INTERNAL fingerprint (only the duplicated flag survives to the
    # output): two independently-seeded xxhash64s — 16-byte struct key,
    # the substring_strip_exact contract — instead of a 32-char md5 hex
    # string through the exchange (r10; the DuckDB oracle keeps md5,
    # results agree because the key never escapes). The relation feeds
    # the occurrence aggregate AND the flag join, so truncate its
    # lineage — un-checkpointed, the explode+hash pass ran twice.
    # duplicated ⟺ corpus-wide occurrence count ≥ 2: ``n_docs > 1 OR
    # n_occ > n_docs`` is exactly ``n_occ >= 2`` (if the fingerprint sits
    # in ≥2 docs the first disjunct fires; if all occurrences are in one
    # doc and n_occ ≥ 2 the second does; n_occ = 1 satisfies neither), so
    # ONE fingerprint-keyed window count replaces the two-count aggregate
    # + join-back (r10, the substring_strip_exact shape): single window
    # pass, one exchange, no per-window materialization.
    wins = pos.select(
        "doc_id",
        _gram_fp_128(
            F.col("__t").substr((F.col("__i") * stride + 1).cast("int"), F.lit(window))
        ).alias("wfp"),
    )
    by_fp = Window.partitionBy("wfp")
    flagged = wins.select(
        "doc_id",
        (F.count(F.lit(1)).over(by_fp) >= 2).cast("int").alias("is_dup"),
    )
    frac_bp = F.floor(F.sum("is_dup") / F.count(F.lit(1)) * 10000 + 0.5)
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("is_dup").cast("long").alias("n_dup_windows"),
        (frac_bp / 10000).alias("dup_win_frac"),
    )


def substring_strip(
    df: DataFrame,
    text_col: str = "text",
    window: int = 40,
    stride: int = 20,
) -> DataFrame:
    """The ACTION half of :func:`substring_dup_spans` (Lee et al. 2022
    actually *remove* the duplicated substrings, not just count them):
    flag every stride-aligned ``window``-char window whose fingerprint (two
    independently-seeded xxhash64s — 128 bits) occurs ≥ 2 times corpus-wide (the exact flag the stats sibling reports —
    ``n_docs > 1 OR n_occ > n_docs`` ⟺ ``n_occ >= 2``), merge
    overlapping/touching flagged windows into maximal char spans, and
    splice the spans out of the text. ALL copies are removed (the
    conservative contract — a keep-one-canonical variant is
    :func:`keep_best` composed over :func:`dedup_clusters`).

    Output: one row per input document —
    ``(doc_id, text_clean, n_spans, n_chars_removed)`` with
    ``n_spans = 0`` and byte-identical ``text_clean`` for untouched docs
    (including docs shorter than one window). By construction
    ``length(text_clean) = length(text) − n_chars_removed`` and every
    flagged window's char range is covered by a removed span.

    RECALL CAVEAT (r9, measured by ``tools/substr_gap_probe.py``
    against a suffix-array ExactSubstr reference on duplicates planted
    at random offsets): stride-aligned windows only match two copies of
    a run when the copies share stride PHASE (offset difference ≡ 0 mod
    stride, probability ~1/stride for cross-doc copies at arbitrary
    offsets). Per-char recall of ≥50-char duplicated runs: **6.1% at
    the (40, 20) default**, 2.2% at (50, 25), 20.8% at (25, 10), 0% at
    stride = window. This operator is therefore a cheap screen for
    PHASE-ALIGNED duplication (shared document prefixes, boilerplate at
    fixed offsets, whole-block copies) — for Lee et al.'s actual
    offset-independent semantics use :func:`substring_strip_exact`
    (measured recall 100%, over-strip 0%), which costs one exploded row
    per character instead of one per stride.

    Scale shape: window explode (narrow) → ONE exchange on the window
    md5 for occurrence counts → flagged windows (the *duplicated* subset
    only) go through the classic gaps-and-islands merge — two window
    functions partitioned by doc_id, row-local after one doc-keyed
    exchange — then segments splice back against the corpus with one
    doc_id-keyed join + per-doc aggregate. The corpus text travels
    through exactly one join; all span arithmetic is exact integer char
    offsets, so the operator is engine-portable and SQL-mirrorable
    (every step is a window function or aggregate — no UDFs).
    """
    if window < 1 or stride < 1:
        raise ValueError("substring_strip: window and stride must be >= 1")
    docs = df.select("doc_id", F.col(text_col).alias("text")).localCheckpoint(
        eager=False
    )
    eligible = docs.filter(F.length("text") >= window)
    n_win = F.expr(f"(length(text) - {int(window)}) div {int(stride)}") + 1
    # INTERNAL window fingerprint → the 16-byte two-seed xxhash64 struct
    # (the substring_strip_exact contract) instead of a 32-char md5 hex
    # string through the occurrence exchange (r10; oracle keeps md5 —
    # the key never escapes, only the >=2 flag does)
    wins = eligible.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_win - 1)).alias("__i"),
        _gram_fp_128(
            F.col("text").substr(
                (F.col("__i") * stride + 1).cast("int"), F.lit(window)
            )
        ).alias("__wfp"),
    )
    # one fingerprint-keyed window count instead of occurrence aggregate
    # + join-back (r10, the substring_strip_exact shape): single window
    # pass, one exchange, no per-window materialization, no
    # duplicated-fingerprint broadcast at scale
    by_fp = Window.partitionBy("__wfp")
    flagged = (
        wins.withColumn("__n_occ", F.count(F.lit(1)).over(by_fp))
        .filter(F.col("__n_occ") >= 2)
        .select(
            "doc_id",
            (F.col("__i") * stride).alias("__s"),
            (F.col("__i") * stride + window).alias("__e"),
        )
    )
    return _strip_flagged_spans(docs, flagged)


def _gram_fp_128(gram):
    """Default 128-bit gram fingerprint for :func:`substring_strip_exact`:
    a struct of two independently-seeded ``xxhash64`` values (Spark's
    builtin seed 42, plus a second stream obtained by prepending a
    literal salt column — xxhash64 chains multi-column input, so the
    salted value is an independent 64-bit stream). 16-byte shuffle key,
    no md5 strings, 2⁻¹²⁸-grade collision envelope."""
    return F.struct(
        F.xxhash64(gram).alias("h1"),
        F.xxhash64(F.lit("aces-fp2"), gram).alias("h2"),
    )


def substring_strip_exact(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 50,
    _fp=None,
) -> DataFrame:
    """EXACT substring dedup-and-strip — the relational equivalent of
    Lee et al. 2022's suffix-array ExactSubstr pass (min duplicated
    length 50): remove every character that lies inside a substring of
    length ≥ ``min_len`` occurring ≥ 2 times corpus-wide, at ANY
    offset. Where :func:`substring_strip`'s stride-aligned windows only
    match two copies that share stride PHASE (measured recall on
    random-offset planted duplicates: 6% at the 40/20 default — see
    ``tools/substr_gap_probe.py``), this operator explodes EVERY
    position's ``min_len``-gram: a duplicated run's grams are identical
    at the same in-run offsets regardless of where each copy sits in
    its document, so recall on ≥ ``min_len`` duplicates is 100% by
    construction (modulo fingerprint collisions: the gram key is TWO
    independently-seeded ``xxhash64`` values — 128 bits — so expected
    birthday collisions are n²/2¹²⁹ ≈ 1.5·10⁻¹¹ falsely-flagged gram
    pairs even at a 100 TB corpus's ~10¹⁴ grams, the same effectively
    corpus-size-independent 2⁻¹²⁸ contract every fingerprint operator
    here shares; a single 64-bit key would expect ~n²/2⁶⁵ ≈ 3·10⁸
    colliding pairs at that scale, unacceptable for an operator that
    DELETES data). The union of flagged ``[pos, pos+min_len)`` spans is
    exactly the duplicated character set: a length-l ≥ min_len run
    contributes grams at offsets 0..l−min_len whose spans tile it.

    Output contract matches :func:`substring_strip`:
    ``(doc_id, text_clean, n_spans, n_chars_removed)``, all copies
    removed, untouched docs byte-identical.

    Scale shape: one row per character (the honest cost of exact
    substring dedup — Lee et al.'s suffix array reads the corpus
    per-byte too), each carrying a 16-byte struct of two xxhash64s →
    ONE exchange keyed by the gram fingerprint, flagged positions merge
    row-locally after one doc-keyed exchange (gaps-and-islands), splice
    via one doc join. Shuffle ≈ 24 bytes/char: use
    :func:`substring_strip` as the cheap screen when phase-aligned
    duplication (shared prefixes, boilerplate blocks at fixed offsets)
    is the target, this when ExactSubstr semantics are.

    ``_fp`` is a test-only hook: a callable mapping the gram Column to
    the fingerprint Column, defaulting to the two-seed 128-bit struct.
    ``tests/test_advice_r10.py`` injects a fingerprint whose first
    component is a forced constant (every gram "collides" on seed 0)
    and asserts distinct grams still do NOT co-flag — the second seed
    alone must disambiguate."""
    if min_len < 1:
        raise ValueError("substring_strip_exact: min_len must be >= 1")
    docs = df.select("doc_id", F.col(text_col).alias("text")).localCheckpoint(
        eager=False
    )
    eligible = docs.filter(F.length("text") >= min_len)
    n_pos = F.length("text") - min_len + 1
    # the gram fingerprint is INTERNAL (only the >=2-occurrence flag
    # survives to the output), so it collapses immediately to a 16-byte
    # struct of two independently-seeded xxhash64s — 128 bits, honoring
    # the 2⁻¹²⁸ contract the docstring promises, without md5 strings
    # (the DuckDB oracle keeps plain md5 grams; results agree because
    # the key never escapes)
    fp = _fp if _fp is not None else _gram_fp_128
    grams = eligible.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), (n_pos - 1).cast("long"))).alias(
            "__i"
        ),
        fp(
            F.col("text").substr((F.col("__i") + 1).cast("int"), F.lit(min_len))
        ).alias("__gfp"),
    )
    # per-position flag via ONE fingerprint-keyed window count instead of
    # the occurrence aggregate + join-back (r10): the gram relation is
    # consumed once (no lineage truncation / per-char materialization
    # needed), pays ONE gram-sized exchange, and — unlike the join form —
    # never builds a broadcast of the full duplicated-gram set, which at
    # 100 TB is itself corpus-scale (the join degrades to a second
    # gram-sized SMJ exchange there; this shape stays one).
    by_fp = Window.partitionBy("__gfp")
    flagged = (
        grams.withColumn("__n_occ", F.count(F.lit(1)).over(by_fp))
        .filter(F.col("__n_occ") >= 2)
        .select(
            "doc_id",
            F.col("__i").alias("__s"),
            (F.col("__i") + min_len).alias("__e"),
        )
    )
    return _strip_flagged_spans(docs, flagged)


def _strip_flagged_spans(docs: DataFrame, flagged: DataFrame) -> DataFrame:
    """Shared back half of :func:`substring_strip` /
    :func:`substring_strip_exact`: merge flagged ``(doc_id, __s, __e)``
    char ranges into maximal spans and splice them out of ``docs``
    (``doc_id, text``). Two doc-keyed window stages + one corpus join."""
    # gaps-and-islands: a window starts a new span iff it begins past the
    # running max end of everything before it (touching spans merge)
    by_start = Window.partitionBy("doc_id").orderBy("__s")
    prev_max = F.max("__e").over(by_start.rowsBetween(Window.unboundedPreceding, -1))
    islands = flagged.withColumn(
        "__isl",
        F.sum(
            F.when(prev_max.isNull() | (F.col("__s") > prev_max), 1).otherwise(0)
        ).over(by_start.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "__isl").agg(
        F.min("__s").alias("__s"), F.max("__e").alias("__e")
    )
    # ONE doc-keyed aggregate carries both the ordered span array and the
    # per-doc stats (r10): the former two-branch form (kept-segment
    # window+join+aggregate ‖ stats aggregate, re-joined onto docs) needed
    # an EAGER localCheckpoint of spans to stop the corpus-wide
    # fingerprint chain replaying per branch — a driver-blocking job plus
    # two extra doc-keyed joins. Spans are merged islands (disjoint, one
    # __s per doc), so array_sort on (__s, __e) structs reproduces the
    # window order exactly, and the whole operator is now one lazy
    # single-consumer chain: islands window → span agg → THIS agg (all on
    # the same doc_id exchange) → one corpus join.
    per_doc = spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("__s", "__e"))).alias("__spans"),
        F.max("__e").alias("__tail_start"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("__e") - F.col("__s")).cast("long").alias("n_chars_removed"),
    )
    # kept segment BEFORE span k: [prev span end (or 0), span start) —
    # row-local over the sorted array (F.get is 0-based and returns NULL
    # out of bounds, so position 0's "previous end" coalesces to 0)
    text = F.col("text")
    prev_e = lambda i: F.coalesce(  # noqa: E731
        F.get(F.col("__spans"), i - 1)["__e"], F.lit(0).cast("long")
    )
    head = F.array_join(
        F.transform(
            F.col("__spans"),
            lambda s, i: text.substr(
                (prev_e(i) + 1).cast("int"), (s["__s"] - prev_e(i)).cast("int")
            ),
        ),
        "",
    )
    out = (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("n_spans").isNull(), text)
            .otherwise(
                F.concat(
                    head,
                    text.substr(
                        (F.col("__tail_start") + 1).cast("int"),
                        (F.length("text") - F.col("__tail_start")).cast("int"),
                    ),
                )
            )
            .alias("text_clean"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("n_chars_removed"), F.lit(0))
            .cast("long")
            .alias("n_chars_removed"),
        )
    )
    return out


def paragraph_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 20,
    sep: str = "\n",
) -> DataFrame:
    """Paragraph-granularity exact dedup (the public "dedup at the
    paragraph level" recipe from Lee et al. 2022, *Deduplicating Training
    Data Makes Language Models Better* — substring dedup approximated at
    paragraph boundaries, the form production corpus cleaning actually
    ships). Returns per-document stats:

    ``(doc_id, n_paras, n_dup_paras, dup_para_frac)`` where a paragraph is
    *duplicated* if its normalized fingerprint appears in more than one
    document OR more than once in this document, counting only paragraphs
    with ≥ ``min_chars`` characters (short boilerplate lines are the
    min-length guard's job, not dedup's).

    Scale shape: posexplode (narrow) → ONE exchange keyed by the paragraph
    md5 (uniform digest keys) for the occurrence counts, then a doc_id-keyed
    partial-agg rollup. No self-joins, no windows over the corpus.
    """
    paras = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("para_idx", "para"),
    ).filter(F.length(F.trim(F.col("para"))) >= min_chars)
    from .text import fingerprint_expr

    keyed = paras.select("doc_id", fingerprint_expr(F.col("para")).alias("pfp"))
    # one digest-keyed aggregate: total occurrences + distinct docs per para
    occ = keyed.groupBy("pfp").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    flagged = keyed.join(occ, "pfp").select(
        "doc_id",
        ((F.col("n_docs") > 1) | (F.col("n_occ") > F.col("n_docs"))).cast("int").alias("is_dup"),
    )
    # dup_para_frac in integer basis points via floor(x*1e4 + 0.5): exact
    # on IEEE doubles in every engine, unlike round(x, 4) whose half-even /
    # half-up behavior diverges between Spark and DuckDB at .xxxx5
    # boundaries (same rule as text.quality_expr)
    frac_bp = F.floor(F.sum("is_dup") / F.count(F.lit(1)) * 10000 + 0.5)
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum("is_dup").cast("long").alias("n_dup_paras"),
        (frac_bp / 10000).alias("dup_para_frac"),
    )


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Incremental-ingest dedup: rows of ``new_docs`` whose normalized
    content fingerprint is NOT already in ``corpus`` and appears exactly
    once within the batch (first occurrence by ``doc_id`` kept). The
    shape every periodic ingest runs: dedup-within-batch, then anti-join
    against the accumulated corpus.

    Scale: both stages key on the md5 digest (uniform); the corpus side of
    the anti-join carries ONLY its fingerprint column. Set
    ``broadcast_corpus=True`` when the accumulated fingerprint set is
    small enough to ship (early corpus life); at steady state leave it to
    a shuffled anti-join — or better, maintain the corpus fingerprints
    bucketed by digest (``sinks.write_bucketed_predicates`` pattern) so
    the exchange happens at write time once.
    """
    fp = new_docs.withColumn("fingerprint", _fp_expr(text_col))
    w = Window.partitionBy("fingerprint")
    batch_canonical = (
        fp.withColumn("__canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__canon"))
        .drop("__canon")
    )
    corpus_fp = corpus.select(_fp_expr(text_col).alias("fingerprint")).distinct()
    if broadcast_corpus:
        corpus_fp = F.broadcast(corpus_fp)
    return batch_canonical.join(corpus_fp, "fingerprint", "left_anti")


def _fp_expr(text_col: str):
    from .text import fingerprint_expr

    return fingerprint_expr(F.col(text_col))


@contextmanager
def scoped_ngram_jaccard_pairs(df: DataFrame, **kwargs):
    """Context-manager wrapper around :func:`ngram_jaccard_pairs` for
    long-lived sessions: yields the pairs DataFrame and unpersists the
    internal shingle cache on exit. Materialize the result INSIDE the
    block (collect/write) — after exit the plan recomputes from source.

    >>> with scoped_ngram_jaccard_pairs(docs, threshold=0.8) as pairs:
    ...     pairs.write.parquet("near_dups")   # doctest: +SKIP
    """
    registry: list = []
    try:
        yield ngram_jaccard_pairs(df, cache_registry=registry, **kwargs)
    finally:
        for cached in registry:
            cached.unpersist()


def _portable_hash(col: Column, seed: int) -> Column:
    """Deterministic 32-bit-ish hash portable across Spark and SQL oracles:
    the first 8 hex chars of ``md5(seed || value)`` as a bigint."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), col)), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    text_col: str = "text",
    hasher: str = "md5",
) -> DataFrame:
    """Per-document MinHash signature: for each of ``num_hashes`` seeded
    hash functions, the min hash over the document's shingles. Output:
    ``(doc_id, h0 .. h{num_hashes-1})``.

    ``hasher``: ``"md5"`` (default) is the engine-portable hash any SQL
    oracle reproduces bit-for-bit; ``"xxhash64"`` is the production fast
    path (single JVM codegen intrinsic per hash instead of a cryptographic
    digest + hex-conv — measured ~5× cheaper on the signature stage at 1M
    docs). Same estimator quality; signatures are not comparable across
    hashers."""
    sh = word_shingles(df, n, text_col)
    if hasher == "xxhash64":
        return sh.groupBy("doc_id").agg(
            *[
                F.min(F.xxhash64(F.lit(seed), F.col("shingle"))).alias(f"h{seed}")
                for seed in range(num_hashes)
            ]
        )
    if hasher != "md5":
        raise ValueError(f"unknown hasher {hasher!r} (md5 or xxhash64)")
    # one md5 yields 32 hex chars = FOUR independent 32-bit hashes; compute
    # ceil(num_hashes/4) digests per shingle instead of num_hashes
    groups = (num_hashes + 3) // 4
    digests = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{g}|"), F.col("shingle"))).alias(f"__m{g}")
            for g in range(groups)
        ],
    )
    aggs = []
    for seed in range(num_hashes):
        g, j = divmod(seed, 4)
        h = F.conv(F.substring(F.col(f"__m{g}"), 8 * j + 1, 8), 16, 10).cast("long")
        aggs.append(F.min(h).alias(f"h{seed}"))
    return digests.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    hasher: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate pairs: signatures split into ``bands`` bands of
    ``num_hashes // bands`` rows; documents sharing any band bucket become a
    candidate pair. Returns distinct ``(doc_a, doc_b)`` with ``doc_a <
    doc_b``.

    Scale path: the band bucket is the shuffle key (uniform by
    construction); no pairwise comparison outside buckets.
    """
    sig = minhash_signatures(df, n, num_hashes, text_col, hasher)
    return _lsh_pairs_from_signatures(sig, num_hashes, bands, hasher)


def _lsh_pairs_from_signatures(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    hasher: str,
    cache_registry: list | None = None,
) -> DataFrame:
    """Band an existing signature relation and emit candidate pairs —
    shared by :func:`minhash_lsh_pairs` and :func:`minhash_jaccard_pairs`
    so the latter computes signatures ONCE for both banding and the
    agreement estimate."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    band_exprs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)]
        bucket = (
            F.xxhash64(*cols).cast("string")
            if hasher == "xxhash64"
            else F.md5(F.concat_ws("_", *cols))
        )
        band_exprs.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    banded = sig.select("doc_id", F.explode(F.array(*band_exprs)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # banded feeds BOTH sides of the bucket self-join: persist once, or
    # the whole shingle→signature pipeline upstream replays per side
    # (callers that persist the signatures still save the banding
    # projection itself from running twice); persist rather than
    # localCheckpoint so scoped callers can release it via the registry
    banded = banded.persist()
    if cache_registry is not None:
        cache_registry.append(banded)

    a = banded.alias("a")
    b2 = banded.alias("b")
    return (
        a.join(b2, on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    hasher: str = "md5",
    cache_registry: list | None = None,
) -> DataFrame:
    """The complete MinHash near-dup pipeline: LSH candidate generation
    (:func:`minhash_lsh_pairs`) followed by the signature-based Jaccard
    ESTIMATE — the fraction of the ``num_hashes`` component minima two
    documents agree on, the standard MinHash estimator — filtered at
    ``threshold``. Returns ``(doc_a, doc_b, jaccard_est)`` with
    ``jaccard_est`` in exact basis points.

    This is the verify stage production dedup runs between candidate
    generation and clustering: it never re-tokenizes the documents — the
    signatures are computed once and reused for both banding and
    estimation, so the post-LSH cost is one broadcast-or-shuffled join of
    the (tiny) candidate set back onto the signature relation, per side.

    Caching note (same contract as :func:`ngram_jaccard_pairs`): the
    signature relation is persisted because it feeds the banding self-join
    AND both estimate-side joins; pass ``cache_registry=[]`` to receive it
    for ``unpersist()`` after materialization in long-lived sessions.
    """
    sig = minhash_signatures(df, n, num_hashes, text_col, hasher)
    # persist: one signature row per doc — far smaller than the corpus;
    # without it the shingle+digest pass runs three times
    sig = sig.persist()
    if cache_registry is not None:
        cache_registry.append(sig)
    cand = _lsh_pairs_from_signatures(
        sig, num_hashes, bands, hasher, cache_registry
    )
    hcols = [f"h{i}" for i in range(num_hashes)]
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(h).alias(f"a_{h}") for h in hcols])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(h).alias(f"b_{h}") for h in hcols])
    agree = sum(
        (F.col(f"a_{h}") == F.col(f"b_{h}")).cast("int") for h in hcols
    )
    est_bp = F.floor(agree / num_hashes * 10000 + 0.5)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (est_bp / 10000).alias("jaccard_est"))
        .filter(F.col("jaccard_est") >= threshold)
    )


@contextmanager
def scoped_minhash_jaccard_pairs(df: DataFrame, **kwargs):
    """Context-manager wrapper around :func:`minhash_jaccard_pairs` for
    long-lived sessions (same contract as
    :func:`scoped_ngram_jaccard_pairs`): yields the pairs DataFrame and
    unpersists the internal signature cache on exit. Materialize the
    result INSIDE the block."""
    registry: list = []
    try:
        yield minhash_jaccard_pairs(df, cache_registry=registry, **kwargs)
    finally:
        for cached in registry:
            cached.unpersist()


def simhash(df: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """Per-document SimHash signature over word tokens.

    Each token contributes ±1 to each bit position according to its md5;
    the signature's bit i is 1 iff the weighted sum is positive. Computed
    as pure expressions: tokens explode → per-bit votes → groupBy doc.
    Returns ``(doc_id, simhash)`` with a ``bits``-wide bigint signature.
    """
    if bits > 32:
        raise ValueError("simhash supports at most 32 bits (portable-hash width)")
    tokens = df.select("doc_id", F.explode(_norm_tokens(text_col)).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    votes = tokens.select(
        "doc_id",
        *[
            F.when((F.shiftright(h, i) % 2) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{i}")
            for i in range(bits)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(F.col(f"b{i}")).alias(f"b{i}") for i in range(bits)]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        sig = bit if sig is None else (sig + bit)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_dup_groups(df: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """Documents sharing an identical SimHash signature (the scalable
    bucket stage of SimHash dedup). Returns
    ``(simhash, n_dups, canonical_doc_id)`` for groups of ≥2."""
    return (
        simhash(df, bits, text_col)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_dups") >= 2)
    )


def simhash_near_pairs(
    df: DataFrame,
    bits: int = 32,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance ``k`` of the SimHash
    signature, via block rotation (the pigeonhole trick): split the
    ``bits``-wide signature into ``k + 1`` contiguous blocks; any two
    signatures at distance ≤ k differ in at most k blocks, so they agree
    EXACTLY on at least one — bucketing on ``(block_idx, block_value)``
    therefore finds every qualifying pair (recall 1.0 within k), and
    ``bit_count(a ^ b)`` verifies candidates. Returns distinct
    ``(doc_a, doc_b, hamming)`` with ``doc_a < doc_b``.

    Scale shape: one signature aggregation, then a bucket equi-join keyed
    by (block, value) — k+1 rows per doc, never all-pairs. Wider signatures
    shrink buckets (32 bits / k=3 → 8-bit blocks → 256 buckets per block);
    candidate verification is a codegen'd xor+popcount.
    """
    if not 0 <= k < bits:
        raise ValueError("need 0 <= k < bits")
    n_blocks = k + 1
    sig = simhash(df, bits, text_col)
    bounds = [bits * b // n_blocks for b in range(n_blocks + 1)]
    block_structs = []
    for blk in range(n_blocks):
        lo, width = bounds[blk], bounds[blk + 1] - bounds[blk]
        mask = (1 << width) - 1
        block_structs.append(
            F.struct(
                F.lit(blk).alias("block"),
                F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
    blocks = sig.select(
        "doc_id", "simhash", F.explode(F.array(*block_structs)).alias("bb")
    ).select("doc_id", "simhash", F.col("bb.block").alias("block"), F.col("bb.val").alias("val"))

    a = blocks.alias("a")
    b2 = blocks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b2, on=["block", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 4,
    window: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing): hash every word
    k-gram, then keep the minimum hash of each sliding window of ``window``
    consecutive k-grams. Near-identical documents share most fingerprints;
    the fingerprint is the shuffle key, so matching is an equi-join.
    Returns distinct ``(doc_id, fingerprint)`` rows.
    """
    # k-gram ORDER matters, so posexplode the ordered gram array and take
    # window minima with a rows frame. (A fully array-native variant —
    # nested transform/slice/array_min — measured 6× slower: higher-order
    # functions fall out of whole-stage codegen, so the per-doc shuffle
    # with codegen'd window minima wins.)
    tokens = _norm_tokens(text_col)
    idx = F.when(
        F.size(tokens) >= k, F.sequence(F.lit(0), F.size(tokens) - k)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, k), " "))
    pos = df.select("doc_id", F.posexplode(grams).alias("pos", "gram"))
    hashed = pos.withColumn("gram_hash", _portable_hash(F.col("gram"), 0)).drop("gram")
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("pos").asc())
        .rowsBetween(0, window - 1)
    )
    n_w = Window.partitionBy("doc_id")
    return (
        hashed.withColumn("fingerprint", F.min("gram_hash").over(w))
        .withColumn("__n", F.max("pos").over(n_w))
        .filter(F.col("pos") <= F.col("__n") - (window - 1))  # full windows only
        .select("doc_id", "fingerprint")
        .distinct()
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Soft near-duplicate pairs by TF-IDF-weighted cosine over the
    df-pruned vocabulary — the similarity miner that catches documents
    sharing a *weighted word distribution* where shingle Jaccard (word
    ORDER) and MinHash (set overlap) both dilute: a shuffled or lightly
    paraphrased copy keeps its tf-idf direction. Returns
    ``(doc_a, doc_b, n_shared_terms, cosine)`` with ``doc_a < doc_b``
    and ``cosine ≥ threshold`` (6-dp floor rule).

    Semantics are defined ON the pruned vocabulary: terms in more than
    ``max_doc_freq`` documents are excluded from weights, norms, AND the
    pair join (self-consistent cosine over the informative vocabulary —
    ubiquitous terms carry ~zero idf anyway, and they are what makes the
    inverted index quadratic). ``idf = ln((N+1)/(df+1))`` (the
    ``tfidf_exact`` / MLlib formula); per-term products and squared
    weights snap to integer micro-units before their SUMs so dot
    products and norms are addition-order-free and any SQL oracle
    agrees bit-for-bit. Documents whose surviving terms all weigh 0
    (df = N edge) are excluded — a zero vector has no direction.

    Scale shape: one tokenize → (doc, term) tf aggregate → df-capped
    inverted-index self-join (per-term fan-out ≤ max_doc_freq², the
    ngram_jaccard boilerplate discipline) → pair aggregate → two
    broadcast-size norm joins. The weight relation feeds three branches
    (norms + both join sides) and is lineage-truncated once.
    """
    from .text import norm_tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(norm_tokens(text_col)).alias("__t")
    ).select(
        "doc_id",
        # the term string never escapes (outputs are ids/counts/cosine):
        # collapse it to xxhash64 immediately — ~5× narrower keys through
        # the tf aggregate and the inverted-index self-join (r10; the
        # _capped_hashed_shingles rule; oracle keeps strings, results
        # agree because the key is internal)
        F.xxhash64(F.col("__t")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    # document frequency as ONE term-keyed window count over the tf
    # relation (r10, the prefix_jaccard shape): the former groupBy
    # aggregate + tf ⋈ dfreq attach paid an extra exchange plus a
    # corpus-sized sort-merge join (dfreq spans all distinct terms —
    # never broadcastable at scale) and forced tf to be lineage-truncated
    # for its two consumers; with the window, tf has one consumer and
    # needs no materialization. The cap filter on the window count prunes
    # identically (the inner join dropped over-cap terms; the filter
    # does).
    wdf = tf.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    if max_doc_freq is not None:
        wdf = wdf.filter(F.col("__df") <= F.lit(int(max_doc_freq)))
    w = (
        wdf.crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log((F.col("__n") + F.lit(1.0)) / (F.col("__df").cast("double") + F.lit(1.0)))
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = (
        w.groupBy("doc_id")
        .agg(
            F.sum(F.floor(F.col("w") * F.col("w") * 1000000 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("__n2_u6")
        )
        .filter(F.col("__n2_u6") > 0)
        # norms feeds BOTH pair-side joins — truncate or the aggregate
        # over the weight relation replays once per branch (plan-audit
        # untruncated_reuse rule)
        .localCheckpoint(eager=False)
    )
    a = w.select("term", F.col("doc_id").alias("doc_a"), F.col("w").alias("__wa"))
    b = w.select("term", F.col("doc_id").alias("doc_b"), F.col("w").alias("__wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(
                F.floor(F.col("__wa") * F.col("__wb") * 1000000 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("__dot_u6"),
        )
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("__n2_u6").alias("__na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("__n2_u6").alias("__nb"))
    cos = (F.col("__dot_u6").cast("double") / 1000000.0) / F.sqrt(
        (F.col("__na").cast("double") / 1000000.0)
        * (F.col("__nb").cast("double") / 1000000.0)
    )
    cos6 = F.floor(cos * 1000000 + F.lit(0.5)).cast("double") / 1000000.0
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "n_shared_terms", cos6.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def ngram_novelty(
    docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams that first appear in that doc (first = owned by the
    minimum doc_id over the whole corpus) — the freshness curve an
    incremental corpus-growth pipeline watches (a crawl snapshot whose
    novelty collapses toward 0 is re-crawling what it already has;
    boilerplate-heavy docs score low against any corpus).

    Returns ``(doc_id, n_shingles, n_novel, novelty_bp)`` for every doc
    with at least one shingle (docs shorter than ``n`` tokens have no
    n-grams and are absent — mirror of the shingle guard). novelty_bp is
    round-half-up basis points via the pure-integer ``(2N+D) div 2D``
    recipe.

    Plan shape — NO join: one shingle exchange (min-over-window marks
    each shingle's owner) + one doc-keyed aggregate. Two exchanges
    total however big the corpus; ownership is a min, so the answer is
    order-free and engine-exact. At 100 TB swap the raw shingle string
    for the hashed-shingle variant (`_capped_hashed_shingles`) — the
    window/agg shape is unchanged."""
    sh = word_shingles(docs, n, text_col)
    w = Window.partitionBy("shingle")
    marked = sh.withColumn("__first", F.min("doc_id").over(w))
    agg = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum((F.col("doc_id") == F.col("__first")).cast("long"))
        .cast("long")
        .alias("n_novel"),
    )
    return agg.withColumn(
        "novelty_bp",
        F.expr("(2 * n_novel * 10000 + n_shingles) div (2 * n_shingles)").cast(
            "long"
        ),
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    cache_registry: list | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard via PREFIX FILTERING
    (the All-Pairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): identical output contract to :func:`ngram_jaccard_pairs`
    (``(doc_a, doc_b, jaccard)``, ``doc_a < doc_b``, basis-point-floored
    ``jaccard ≥ threshold``) with a fundamentally smaller candidate
    join, and EXACT over the 64-bit hashed shingles — no boilerplate
    cap, no recall loss from the prefix filter itself. (Like every
    hashed-shingle miner in this module, shingles are reduced to
    xxhash64 values first, so exactness is modulo 64-bit shingle-hash
    collisions — vanishingly rare but not impossible.)

    The filter: sort every document's shingle set by one global order
    (document frequency ascending, hash ascending — rarest first); for
    Jaccard ≥ t a document only needs its first ``s − ⌈t·s⌉ + 1``
    shingles indexed, because two qualifying sets sorted by the same
    order must collide inside those prefixes (pigeonhole). The self-join
    therefore touches ~(1−t) of each document's shingles — and they are
    by construction the RAREST ones, so the per-key fan-out that makes a
    full inverted index quadratic on hot shingles never materializes.
    The length filter ``t·s_b ≤ s_a`` (for ``s_a ≤ s_b``) prunes
    mismatched sizes before the pair exists. Survivors are verified
    exactly: one row-local ``array_intersect`` against the two full
    sorted shingle arrays.

    Exactness of the prefix length at any scale: ``⌈t·s⌉`` is computed
    in integer basis points (``t_bp·s`` stays below 2^53 for any real
    document, so the floor is engine-exact). Thresholds below 0.05 are
    rejected — the prefix would be the whole document and the filter
    pointless; use :func:`ngram_jaccard_pairs` there.

    Scale shape: shingle relation (hashed, persisted — caller owns via
    ``cache_registry``, same contract as :func:`ngram_jaccard_pairs`) →
    one df-count aggregate → per-doc rank window → prefix self-join →
    distinct pairs → two bounded joins against the per-doc arrays. The
    full-array relation is corpus-sized but NARROW (one array per doc)
    and feeds exactly two candidate-keyed joins.
    """
    t_bp = int(round(threshold * 10000))
    if not 500 <= t_bp <= 10000:
        raise ValueError("prefix_jaccard_pairs: threshold must be in [0.05, 1]")
    sh = word_shingles(df, n, text_col).select(
        "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
    ).persist()
    if cache_registry is not None:
        cache_registry.append(sh)

    prefix = _prefix_relation(sh, t_bp).localCheckpoint(eager=False)
    arrs = (
        sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("__arr"))
        .localCheckpoint(eager=False)
    )
    cands = _prefix_candidates(prefix, t_bp).distinct()
    return _prefix_verify(cands, arrs, threshold)


def _prefix_relation(sh: DataFrame, t_bp: int) -> DataFrame:
    """Stage 1 of :func:`prefix_jaccard_pairs`: the indexed prefix
    relation ``(doc_id, shingle, __s, __p)`` — each doc's
    ``s − ⌈t·s⌉ + 1`` globally-rarest shingles with size and rank.
    Split out (r10) so the single-host sf10 streamed runner
    (``tools/prefix_sf10_stream.py``) can checkpoint it to parquet and
    process the candidate mass in shingle-hash block ranges without
    duplicating the operator's semantics."""
    # document frequency via ONE shingle-keyed window count (r10): the
    # former groupBy + sh ⋈ dfreq attach paid a distinct-shingle
    # aggregate exchange plus a corpus-sized sort-merge join (dfreq is
    # all distinct shingles — never broadcastable at scale); the window
    # computes the identical per-shingle count in the single exchange
    # the join side already paid
    ranked = (
        sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .withColumn(
            "__p",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("__df").asc(), F.col("shingle").asc()
                )
            ),
        )
        .withColumn("__s", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    # ceil(t*s) in integer basis points; t_bp*s < 2^53 so the floor-div
    # of exact-integer doubles is engine-exact
    ceil_ts = F.floor((F.lit(t_bp) * F.col("__s") + 9999) / 10000).cast("long")
    # feeds BOTH self-join sides in the operator: callers truncate so
    # the df-count join + rank window don't replay per branch
    return ranked.filter(F.col("__p") <= F.col("__s") - ceil_ts + 1).select(
        "doc_id", "shingle", "__s", "__p"
    )


def _prefix_candidates(prefix: DataFrame, t_bp: int) -> DataFrame:
    """Stage 2: the raw (pre-distinct) candidate pairs from the prefix
    self-join with the length + PPJoin positional filters. Callers own
    the ``distinct()`` — the streamed runner dedupes within each
    shingle-hash block and again across blocks (a pair colliding on
    shingles in two blocks verifies to the same jaccard, so the final
    distinct restores exactly the one-shot output)."""
    a = prefix.alias("a")
    b = prefix.alias("b")
    # PPJoin positional filter (Xiao et al. WWW'08 §3.2): at a prefix
    # collision at ranks (p_a, p_b), the pair's attainable overlap is at
    # most 1 + min(s_a−p_a, s_b−p_b); J ≥ t needs overlap ≥ α =
    # ceil(t(s_a+s_b)/(1+t)). A true pair keeps every collision row
    # (the bound is an upper bound on its real overlap), so the prune is
    # output-invariant — it only drops candidates whose collision sits
    # too deep to ever reach α, BEFORE they hit the distinct's shuffle
    # (the disk-pressure stage in the storm regime).
    alpha = F.floor(
        (
            F.lit(t_bp) * (F.col("a.__s") + F.col("b.__s"))
            + F.lit(10000 + t_bp - 1)
        )
        / F.lit(10000 + t_bp)
    ).cast("long")
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J >= t needs t*max(s) <= min(s)
            & (
                F.lit(t_bp) * F.greatest(F.col("a.__s"), F.col("b.__s"))
                <= F.lit(10000) * F.least(F.col("a.__s"), F.col("b.__s"))
            )
            & (
                F.lit(1)
                + F.least(
                    F.col("a.__s") - F.col("a.__p"),
                    F.col("b.__s") - F.col("b.__p"),
                )
                >= alpha
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    return cands


def _prefix_verify(cands: DataFrame, arrs: DataFrame, threshold: float) -> DataFrame:
    """Stage 3: exact verification of distinct candidate pairs — one
    row-local ``array_intersect`` against the two full sorted shingle
    arrays (``arrs``: ``(doc_id, __arr)``), basis-point-floored jaccard
    ≥ ``threshold``."""
    va = arrs.select(F.col("doc_id").alias("doc_a"), F.col("__arr").alias("__aa"))
    vb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("__arr").alias("__ab"))
    common = F.size(F.array_intersect(F.col("__aa"), F.col("__ab"))).cast("long")
    jac = common / (F.size("__aa") + F.size("__ab") - common)
    jac_bp = F.floor(jac * 10000 + 0.5) / 10000
    return (
        cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .select("doc_a", "doc_b", jac_bp.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
