"""§2 M — Deduplication operators for training-data pipelines.

Scale ladder (the 100 TB story):
1. ``llm_dedup_exact`` — hash-groupBy, one shuffle on md5(text). The first
   pass of any corpus dedup; at 100 TB runs as a straight shuffle.
2. ``llm_near_dup_pairs`` — exact set-Jaccard on blocked candidate pairs
   (lang blocking here; at scale the blocker is LSH bands, not lang).
   Quadratic within blocks — the correctness baseline for (3).
3. ``llm_dedup_minhash`` — MinHash-LSH: shingle → minhash signature →
   band-bucket join; candidate pairs grow ~linearly with corpus size.
4. ``llm_simhash`` — 64-bit SimHash fingerprints via weighted token-hash
   bit voting; near-dups = small Hamming distance on a cheap integer key.
5. ``llm_fingerprint`` — deterministic document fingerprint (normalized
   md5 + shingle sketch) used as the catalog identity of a document.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


@query(
    "llm_dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup: canonical doc per md5(text), duplicate count."""
    d = tables.load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "llm_near_dup_pairs",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
             6) AS jaccard
FROM d a JOIN d b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95
""",
)
def llm_near_dup_pairs(spark, sf_dir):
    """Near-duplicate pairs by token-set Jaccard ≥ 0.95, blocked by lang.

    Fully distributed EXACT set-similarity self-join via prefix filtering
    (the PPJoin family — Xiao et al., "Efficient Similarity Joins for Near
    Duplicate Detection", WWW'08):

    1. Global token order = (document frequency ASC, token) — rarest
       first. One explode + one count aggregate; no driver state.
    2. Each doc keeps only its PREFIX under that order: the first
       |A| - floor(τ·|A|) + 1 tokens. Theorem: two sets with
       J(A,B) ≥ τ (given the size filter below) must share a prefix
       token — so an equi-join on (prefix token, lang) finds every
       qualifying pair with no false negatives. At τ=0.95 the prefix is
       ~5% of each doc, and prefix tokens are the RARE ones, so bucket
       sizes — hence candidate volume — stay small even though hot
       tokens exist in the corpus.
    3. Size filter τ·max(|A|,|B|) ≤ min(|A|,|B|) prunes candidates.
    4. Exact verify: join token sets back by doc_id, one JVM-side
       array_intersect per surviving candidate pair.

    Replaces a driver-collect design (toPandas + dense doc×vocab
    broadcast matmul): this plan has no driver state, every stage is a
    shuffle-partitioned join/agg, and candidate volume tracks true-dup
    density — the 100 TB shape. Exactness (vs MinHash banding) means no
    probabilistic false-negative flake against the oracle (property-
    tested vs brute force in tests/test_properties.py).
    """
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    return prefix_filter_pairs(d, tau=0.95)


def _nullkey():
    """NULL-lang-or-NULL-toks predicate (lazy: building a Column needs
    an active session, so this cannot be a module constant)."""
    return F.col("lang").isNull() | F.col("toks").isNull()


def quotient_token_sets(d):
    """Stage-0 identity quotient shared by the near-dup ladder kernels
    (prefix_filter_pairs, minhash_lsh_pairs, prefix_df_median/near_dup
    — ONE definition so the router's diagnostic can never drift from
    the rungs it routes between): one representative per unique
    (lang, sorted token set) with gid = min member doc_id + the member
    list; NULL-lang/NULL-toks rows pass through as their OWN singleton
    groups (groupBy treats NULLs as equal, but a NULL key satisfies no
    equi conjunct in the direct join or any oracle, and expand=False
    consumers need them as isolated nodes, not one spurious clique).

    localCheckpointed LAZILY (optimization round 14, guide §1.2): the
    first consuming action materializes the cache inside its own job,
    saving the eager form's extra scheduler round-trip; every later
    consumer (≥3 per kernel) reads the materialized partitions either
    way. Lazy materialization is only sound because every column is a
    DETERMINISTIC function of the group — members is sort_array'd and
    toks is the sorted group key itself (the old ``first(toks)`` was
    pick-any; all consumers are set-ops: explode, size, array_intersect,
    per-element hashing — so the sorted representative is output-
    identical) — hence two stages racing to compute an uncached
    partition produce bit-identical rows."""
    grouped = (
        d.where(~_nullkey())
        .groupBy("lang", F.array_sort("toks").alias("_skey"))
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .select("lang", "gid", "members", F.col("_skey").alias("toks"))
    )
    singletons = d.where(_nullkey()).select(
        "lang",
        F.col("doc_id").alias("gid"),
        F.array("doc_id").alias("members"),
        "toks",
    )
    return grouped.unionByName(singletons).localCheckpoint(eager=False)


def _prefix_index(g, tau: float):
    """The df-ordered prefix inverted index over a quotient's
    representatives: each rep keeps its |A| - floor(τ·|A|) + 1 RAREST
    tokens under the global (df ASC, token) order. One frame, consumed
    twice by the candidate self-join — localCheckpointed lazily (the
    candidate join, or the router's percentile aggregate, materializes
    it inside its first job; rows are deterministic — (df, t) is a
    total order per doc — so racing stages compute identical
    partitions). Shared by the kernel and the near_dup router's
    saturation diagnostic (the median df of exactly these rows IS the
    rung-selection signal)."""
    reps = g.where(~_nullkey()).select(
        F.col("gid").alias("doc_id"), "lang", "toks"
    )
    tok = reps.select(
        "doc_id", "lang", F.size("toks").alias("sz"), F.explode("toks").alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = (
        F.col("sz") - F.floor(F.col("sz") * F.lit(tau)).cast("long") + F.lit(1)
    )
    return (
        tok.join(freq, "t")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "t")),
        )
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "lang", "sz", "t", "df", "rn")
        .localCheckpoint(eager=False)
    )


def prefix_filter_pairs(d, tau: float, expand: bool = True, counters=None,
                        prebuilt=None):
    """Prefix-filtering exact set-similarity self-join (reusable kernel).

    ``d`` must have columns (doc_id, lang, toks) with distinct token
    arrays. Returns all same-lang pairs with token-set Jaccard ≥ tau as
    (id1, id2, jaccard). With ``expand=False`` it instead returns the
    quotient form ``(g, rep_pairs)`` — the identity groups (gid = min
    member doc_id, members, toks) and the pairs BETWEEN group
    representatives — for consumers like connected components that are
    cheaper on the quotient graph and can expand labels afterwards.

    Stage 0 collapses IDENTICAL token sets first: all the join/verify
    math runs once per unique (lang, sorted token set); member pairs are
    expanded afterwards (within a group every pair is exactly J=1.0; a
    cross-group pair inherits its representatives' Jaccard verbatim, so
    the output is bit-identical to the uncollapsed join). On dup-dense
    corpora — the case near-dup detection exists for — this turns k
    exact copies from k² join work into 1 representative plus pure
    output expansion; on a dup-free corpus it costs one extra hash
    aggregate. Empty token sets are excluded from the J=1.0 expansion
    (0/0 is NaN — not a pair — in the direct computation too).

    NULL lang or NULL toks rows become their OWN singleton groups, not
    one merged group: groupBy treats NULLs as equal, but in the direct
    join (and every caller's SQL oracle) a NULL key satisfies no equi
    conjunct, so null-keyed docs never pair — and expand=False
    consumers (connected components, triangle counting) must see them
    as isolated nodes, not as one spurious identity clique.

    ``counters``: optional dict for scale studies
    (tools/stress_unique.py) — when given, the surviving candidate
    count is materialized into counters["candidates"] (one extra
    count() action; never passed by registry keys).

    ``prebuilt``: optional (g, prefix) pair from quotient_token_sets /
    _prefix_index — the near_dup router builds both for its saturation
    diagnostic and passes them through so the routed exact run never
    recomputes the index.
    """
    # 0. one representative per unique (lang, token set); null-keyed
    # rows pass through as singleton groups (see docstring)
    if prebuilt is not None:
        # (g, prefix) from the near_dup router — the diagnostic already
        # built exactly these frames; never rebuild them
        g, prefix = prebuilt
    else:
        g = quotient_token_sets(d)  # feeds prefix, verify ×2, expand ×3
        prefix = _prefix_index(g, tau)  # consumed twice by the self-join
    a, b = prefix.alias("a"), prefix.alias("b")
    # Positional filter (PPJoin): tokens are ranked by the SAME global
    # order in every doc, so for a match at ranks (i, j) every shared
    # token ranks ≥ i in A and ≥ j in B, giving the overlap upper bound
    # 1 + min(|A|-i, |B|-j). J ≥ τ needs overlap ≥ τ/(1+τ)·(|A|+|B|);
    # rows whose bound can't reach it are dropped. Safe: a qualifying
    # pair's EARLIEST shared prefix token carries the loosest bound and
    # always passes, and one surviving row is enough (distinct below).
    # On low-τ joins over repetitive corpora this is the difference
    # between verifying every co-bucketed pair and verifying only
    # plausible ones.
    overlap_bound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
    )
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.sz"), F.col("b.sz"))
                >= F.lit(tau) * F.greatest(F.col("a.sz"), F.col("b.sz"))
            )
            & (
                overlap_bound
                >= F.lit(tau / (1.0 + tau)) * (F.col("a.sz") + F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    if counters is not None:
        # DISK_ONLY, not localCheckpoint(eager): the candidate set is
        # the one frame here that scales with corpus² on saturated
        # vocabularies (268M pairs on the 10× dup-free rung), and a
        # MEMORY_AND_DISK materialization pins the unified manager's
        # protected storage region — the round-12 rung needed a 48 GB
        # local JVM because later stages' shuffle sorters could no
        # longer acquire execution memory (probed round 13: the OOM
        # lands in ShuffleExchangeExec's round-robin determinism sort,
        # "unable to acquire 65536 bytes"). On disk the reuse costs one
        # serialized read and the heap stays execution-only.
        from pyspark import StorageLevel

        cand = cand.persist(StorageLevel.DISK_ONLY)
        counters["candidates"] = cand.count()
        # the persisted blocks must outlive THIS call (the returned
        # pairs frame still references cand lazily), so the release is
        # the caller's: counters["unpersist"]() after the pairs are
        # materialized. Without it a long-lived session looping stress
        # copies accumulates 268M-row disk block sets for its lifetime
        # (ADVICE r13) — tools/stress_unique.py calls it per key.
        counters["unpersist"] = lambda: cand.unpersist()
    verify = cand.join(
        g.select(F.col("gid").alias("id1"), F.col("toks").alias("toks1")), "id1"
    ).join(
        g.select(F.col("gid").alias("id2"), F.col("toks").alias("toks2")), "id2"
    )
    inter = F.size(F.array_intersect("toks1", "toks2")).cast("double")
    jac = inter / (F.size("toks1") + F.size("toks2") - inter)
    rep_pairs = verify.where(jac >= tau).select(
        "id1", "id2", F.round(jac, 6).alias("jaccard")
    )
    if not expand:
        return g, rep_pairs
    # expansion: representative pairs → member pairs (pure output work,
    # distributed: a straight explode×explode runs each group's k²
    # expansion inside ONE Generate task — the 100× stress corpus has a
    # 23k-member identity group whose 269M within-pairs pinned a single
    # core for minutes while 31 sat idle; chunked_* bounds per-task work)
    cross = expand_member_pairs(rep_pairs, g, ("jaccard",), "id1", "id2")
    within = chunked_self_pairs(
        g.where((F.size("members") >= 2) & (F.size("toks") > 0)).select("members"),
        "members",
        "id1",
        "id2",
    ).select("id1", "id2", F.lit(1.0).alias("jaccard"))
    return cross.unionByName(within)


# SCALE.md round-12 rung-selection rule, made executable: above this
# median prefix-token document frequency the exact prefix join is past
# its domain (vocabulary / shingle-space saturation — every "rare"
# prefix token is actually hot, candidate volume goes ~quadratic) and
# the sketch rung (llm_dedup_minhash, measured flat on the same
# corpus) should run instead.
PREFIX_DF_SATURATION = 50


def prefix_df_median(d, tau: float, prefix=None) -> float:
    """Median document frequency of the tokens that would enter the
    prefix index at threshold ``tau`` — the one-aggregate diagnostic
    behind SCALE.md's dedup-ladder deployment rule (round 12, measured
    on the dup-free rung: the saturated 31-word corpus reads df≈90 on
    its 3-shingle prefixes and produced 54M dead candidates, while the
    sf fixtures' shingle prefixes read df≈1). ``d`` is the same
    (doc_id, lang, toks) frame prefix_filter_pairs takes. Cost: the
    SAME quotient + explode + df aggregate + prefix window the kernel
    itself runs (quotient_token_sets / _prefix_index — one definition,
    not a copy, so on dup-dense corpora the diagnostic reads the df the
    kernel's prefix index actually sees: k exact copies contribute 1,
    not k) — plus one exact median, one driver scalar — run it BEFORE
    committing a corpus to the exact rung. Returns 0.0 for an
    empty/degenerate corpus. ``prefix``: optional prebuilt
    _prefix_index frame (the near_dup router shares one build)."""
    if prefix is None:
        prefix = _prefix_index(quotient_token_sets(d), tau)
    row = prefix.agg(F.expr("percentile(df, 0.5)").alias("m")).collect()[0]
    return float(row["m"]) if row["m"] is not None else 0.0


def lsh_plan(tau: float, recall: float = 0.98, max_hashes: int = 64):
    """Pick MinHash banding (rows_per_band, bands) for threshold ``tau``
    — the S-curve tuning step every textbook LSH deployment performs
    and a fixed 4×4 scheme skips. The collision probability of a pair
    at Jaccard j is 1-(1-j^r)^b: MORE rows per band r = a sharper
    filter against sub-threshold pairs, at the cost of more bands b
    (hence hashes) to keep recall at tau. This scans r upward and keeps
    the largest r whose minimal b fits the hash budget, guaranteeing
    1-(1-tau^r)^b ≥ ``recall`` at the threshold.

    Why it matters, measured (SCALE.md round 13): on the 10× dup-free
    rung's saturated UNIGRAM domain (background pair similarity ≈ 0.6)
    the fixed 4×4 scheme — S-curve midpoint (1/4)^(1/4) ≈ 0.71 —
    candidates ~43% of all 1.25B pairs at tau=0.95 and ran >28 minutes
    where the exact rung took 243 s; the tuned (r=11, b=5) plan
    collides sub-threshold pairs at 0.6^11-per-band (~1.8% overall)
    and finishes in minutes. tau is clamped to [0.05, 0.99]: at
    tau→1.0 the minimal-b formula degenerates (exact duplicates are
    caught by the quotient regardless).
    """
    import math

    t = min(max(tau, 0.05), 0.99)
    best = None
    for r in range(1, max_hashes + 1):
        p = t**r
        if p < 1e-12:  # 1-p rounds to 1.0 in double — no sharper plan fits
            break
        b = math.ceil(math.log(1 - recall) / math.log(1 - p))
        if r * b > max_hashes:
            if best is not None:
                break  # b(r) grows ~recall-factor/t^r: larger r never fits
            continue
        best = (r, b)
    # nothing reaches the recall target inside the budget (tau ~0.05):
    # spend the whole budget on 1-row bands — the best recall available
    return best if best is not None else (1, max_hashes)


def minhash_lsh_pairs(d, tau: float, n_hashes: int | None = None,
                      bands: int | None = None, g=None):
    """MinHash-LSH near-dup pairs over a generic (doc_id, lang, toks)
    frame — the sketch rung of the dedup ladder, with the SAME output
    contract as prefix_filter_pairs: same-lang (id1, id2, jaccard) with
    exact token-set Jaccard ≥ tau, id1 < id2, jaccard rounded to 6.

    Banding is TAU-ADAPTIVE by default (``lsh_plan``: the largest
    rows-per-band whose recall-0.98 band count fits a 64-hash budget,
    e.g. tau=0.95 → 11×5, tau=0.30 → 1×11), because a fixed scheme has
    one S-curve midpoint and mis-tuning it is catastrophic on corpora
    with high background similarity — measured on the saturated 10×
    rung, SCALE.md round 13. ``n_hashes`` alone raises/lowers the
    planner's hash budget; ``n_hashes`` + ``bands`` pins a scheme
    exactly (``bands`` must divide a positive rows-per-band out of the
    budget — validated, since a silent ``n_hashes // bands == 0`` would
    explode into a zero-argument xxhash64 deep in the plan).

    Candidates come from a banded bucket self-join (never all-pairs;
    bucket volume tracks the density of NEAR-tau pairs), then every
    candidate is verified by exact array_intersect Jaccard, so there
    are NO false positives and the jaccard values are exact; the
    approximation is RECALL ONLY — a true pair whose sets share no
    band (P_miss = (1-tau^r)^b ≤ 0.02 by construction) is absent.
    Identical sets are quotiented first (identical sigs ⇒ identical
    buckets ⇒ guaranteed candidates, so exact-duplicate recall is 1.0
    by construction); null-keyed and empty-toks rows pair with
    nothing, matching the exact kernel's join semantics. ``g``:
    optional prebuilt quotient_token_sets frame (the near_dup router
    shares one build across diagnostic and rung).
    """
    if bands is None:
        # n_hashes (when given) is a budget for the planner, not a
        # band-less scheme
        rows_per_band, bands = lsh_plan(
            tau, max_hashes=n_hashes if n_hashes is not None else 64
        )
        n_hashes = rows_per_band * bands
    else:
        if n_hashes is None:
            raise ValueError("bands given without n_hashes — pass both to pin")
        rows_per_band = n_hashes // bands
        if bands < 1 or rows_per_band < 1:
            raise ValueError(
                f"invalid banding: n_hashes={n_hashes}, bands={bands} "
                f"(rows_per_band={rows_per_band})"
            )
        n_hashes = rows_per_band * bands  # drop unusable tail hashes
    rows_per_band = n_hashes // bands
    if g is None:
        g = quotient_token_sets(d)  # feeds sig, verify ×2, expansion ×2
    # (a shared quotient may carry null-keyed singleton rows: their
    # null toks explode to no signature rows and their null lang
    # equi-matches nothing — zero pairs either way, same contract)
    sh = g.select("gid", "lang", F.explode("toks").alias("t"))
    sig = sh.groupBy("gid", "lang").agg(
        *[
            F.min(F.xxhash64(F.col("t"), F.lit(i))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    band_rows = sig.select(
        "gid",
        "lang",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("gid", "lang", "bb.band", "bb.bucket")
    cand = (
        band_rows.alias("x")
        .join(
            band_rows.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.lang") == F.col("y.lang"))
            & (F.col("x.gid") < F.col("y.gid")),
        )
        .select(F.col("x.gid").alias("id1"), F.col("y.gid").alias("id2"))
        .distinct()
    )
    verify = cand.join(
        g.select(F.col("gid").alias("id1"), F.col("toks").alias("toks1")), "id1"
    ).join(
        g.select(F.col("gid").alias("id2"), F.col("toks").alias("toks2")), "id2"
    )
    inter = F.size(F.array_intersect("toks1", "toks2")).cast("double")
    jac = inter / (F.size("toks1") + F.size("toks2") - inter)
    rep_pairs = verify.where(jac >= tau).select(
        "id1", "id2", F.round(jac, 6).alias("jaccard")
    )
    cross = expand_member_pairs(rep_pairs, g, ("jaccard",), "id1", "id2")
    within = chunked_self_pairs(
        g.where((F.size("members") >= 2) & (F.size("toks") > 0)).select("members"),
        "members",
        "id1",
        "id2",
    ).select("id1", "id2", F.lit(1.0).alias("jaccard"))
    return cross.unionByName(within)


# Above this corpus size the router's diagnostic runs on a
# deterministic hash-sample of documents instead of the full corpus
# (VERDICT r13 item 4): prefix_df_median is linear, but a FULL
# quotient + explode + df aggregate + prefix window just to pick a rung
# is the wrong opening move at 100 TB. Sized so every driver fixture
# (500–50k docs) keeps the shared-build full-diagnostic path.
NEAR_DUP_SAMPLE_DOCS = 60_000
# The sampled threshold is saturation/m (a token with full df D keeps
# expected df D/m in a 1/m doc sample), but df can never fall below 1
# for a token that survives at all, so m is capped to keep the scaled
# threshold >= this floor — otherwise a df-sparse corpus (df ~= 1)
# would read as saturated. With the default saturation 50 the cap is
# m <= 10: the diagnostic reads at most 1/10 of a huge corpus and the
# two measured SCALE.md rungs sit decades clear of the scaled
# threshold on either side (sparse ~= 1 vs 5; saturated 90/m >= 9).
_SAMPLE_SAT_FLOOR = 5.0


def near_dup(d, tau: float, saturation: float = PREFIX_DF_SATURATION,
             route_info: dict | None = None,
             sample_docs: int | None = NEAR_DUP_SAMPLE_DOCS):
    """Self-dispatching near-dup: the SCALE.md dedup-ladder deployment
    rule as ONE call instead of a runbook (VERDICT round-12 item 2).

    Measures ``prefix_df_median(d, tau)`` — the same prefix-token df
    the exact kernel's inverted index would see — and routes:

    - df median < ``saturation``: the corpus is in the exact rung's
      domain (rare prefix tokens ⇒ small candidate buckets) → run
      ``prefix_filter_pairs`` (zero false negatives).
    - df median ≥ ``saturation``: shingle-space saturation — every
      "rare" prefix token is hot and exact candidates go ~quadratic
      (the 31-word corpus produced 54M dead candidates, SCALE.md
      round 12) → run ``minhash_lsh_pairs`` (candidate volume bounded
      by banding; recall-approximate, precision-exact).

    Both rungs return the same (id1, id2, jaccard) contract, so callers
    compose downstream (clustering, canonical pick) unchanged.
    ``route_info`` (optional dict) receives {"prefix_df_median",
    "route", "saturation"} for observability.

    Two diagnostic regimes (VERDICT r13 item 4):

    - corpus <= ``sample_docs``: the quotient and the prefix index are
      built ONCE and SHARED — the diagnostic reads its median off the
      same frames the routed exact run then joins (prebuilt=), so
      routing adds one percentile aggregate, not a second index build;
      the LSH route reuses the quotient.
    - corpus > ``sample_docs``: the diagnostic runs on a DETERMINISTIC
      hash-sample (xxhash64(doc_id) % m == 0, m = ceil(n/sample_docs)
      capped so saturation/m >= _SAMPLE_SAT_FLOOR) against the scaled
      threshold saturation/m, and NOTHING is prebuilt: the full index
      is only constructed if the exact rung is actually chosen. The
      sizing count is one narrow count job (parquet footer-cheap on
      scan-backed frames); route_info additionally records
      {"n_docs", "sample_mod", "scaled_saturation"}. Sample-vs-full
      routing agreement is pinned on both rung shapes by
      tests/test_near_dup_auto.py. ``sample_docs=None`` forces the
      full shared-build diagnostic at any size.
    """
    samp_cap = int(saturation // _SAMPLE_SAT_FLOOR)
    if sample_docs and samp_cap >= 2:
        n = d.count()
        if n > sample_docs:
            mod = min(-(-n // sample_docs), samp_cap)
            ds = d.where(F.xxhash64(F.col("doc_id")) % mod == 0)
            med = prefix_df_median(ds, tau)
            scaled = saturation / mod
            route = "exact_prefix" if med < scaled else "minhash_lsh"
            if route_info is not None:
                route_info.update(
                    {
                        "prefix_df_median": med,
                        "route": route,
                        "saturation": saturation,
                        "n_docs": n,
                        "sample_mod": mod,
                        "scaled_saturation": scaled,
                    }
                )
            if route == "exact_prefix":
                return prefix_filter_pairs(d, tau)
            return minhash_lsh_pairs(d, tau)
    g = quotient_token_sets(d)
    prefix = _prefix_index(g, tau)
    m = prefix_df_median(d, tau, prefix=prefix)
    route = "exact_prefix" if m < saturation else "minhash_lsh"
    if route_info is not None:
        route_info.update(
            {"prefix_df_median": m, "route": route, "saturation": saturation}
        )
    if route == "exact_prefix":
        return prefix_filter_pairs(d, tau, prebuilt=(g, prefix))
    return minhash_lsh_pairs(d, tau, g=g)


# Broadcast size gate for the CC label loop (round 15): a labels row is
# two longs (~16 B framed), so 2M reps is a ~32 MB broadcast — well
# under the guide §3.1 comfort band ("a few hundred MB is usually
# fine") with a wide margin for the driver building one per round.
# Above the cap the loop uses plain joins and lets AQE pick the
# strategy — the 100 TB shape, where the quotient is corpus-sized and
# broadcasting it would OOM the driver.
LABEL_BROADCAST_CAP = 2_000_000

PAIR_CHUNK = 512


def _chunks(col: str, chunk: int):
    """Array column → array of ≤chunk-element slices (≥1 slice even when
    empty, so downstream chunk-pair bookkeeping never sees zero rows;
    an empty slice explodes to nothing, matching plain-explode
    semantics on empty arrays)."""
    return F.expr(
        f"transform(sequence(0, greatest(cast(ceil(size({col})/{chunk}.0) as int), 1) - 1),"
        f" i -> slice({col}, i*{chunk}+1, {chunk}))"
    )


def chunked_self_pairs(df, arr, out_a, out_b, payload=(), chunk=PAIR_CHUNK):
    """All unordered element pairs of ``arr`` per row, with BOUNDED
    per-task expansion work.

    explode(arr) → explode(arr) → filter(a < b) runs each row's entire
    C(k,2) expansion inside one Generate task, because a generator
    cannot split one input row across tasks — a hot identity group
    (k=23,200 at the 100× stress scale, C(k,2)=269M pairs) therefore
    serializes on a single core and GC-thrashes the executor while the
    rest of the cluster idles. Here the array is sliced into ≤chunk
    pieces, chunk PAIRS (i ≤ j) are exploded first — |k/chunk|² small
    rows carrying two ~chunk-element slices — then a CONTENT-HASH
    ``repartition(p, xxhash64(_i, _j, _ca))`` spreads them (an
    explicit-numPartitions shuffle, which AQE never re-coalesces)
    before the element-level explodes, so no task generates more than
    ~chunk² rows per chunk pair. Hash, not round-robin (round 13):
    RoundRobinPartitioning makes Spark SORT every map partition first
    for retry determinism (spark.sql.execution.sortBeforeRepartition),
    and on the 10× dup-free rung that sorter was where the heap died;
    hash partitioning is retry-deterministic by construction — no sort,
    same spread (the hash covers the chunk CONTENT, so the (0,0) chunk
    pairs of different groups land on different partitions). Output: payload columns + (out_a, out_b) with
    out_a < out_b by value — exactly the rows of the naive
    explode×explode ``a < b`` expansion (including over arrays with
    duplicate values); only the physical distribution changes.

    The cross-chunk branch (``_i < _j``) carries an ``_ea != _eb``
    guard: without it, a value appearing in two different chunks would
    meet itself there and least/greatest would emit a (v, v) equal pair
    the naive expansion drops. Every current caller passes distinct
    collect_list-over-key member lists (where the guard is vacuous),
    but the helper is total over duplicate arrays — pinned by
    tests/test_chunked_helpers.py::test_chunked_self_pairs_duplicate_arrays.
    """
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    payload = list(payload)
    return (
        df.select(*payload, _chunks(arr, chunk).alias("_chs"))
        .select(*payload, "_chs", F.posexplode("_chs").alias("_i", "_ca"))
        .select(*payload, "_i", "_ca", F.posexplode("_chs").alias("_j", "_cb"))
        .where(F.col("_j") >= F.col("_i"))
        .repartition(p, F.xxhash64("_i", "_j", "_ca"))
        .select(*payload, "_i", "_j", F.explode("_ca").alias("_ea"), "_cb")
        .select(*payload, "_i", "_j", "_ea", F.explode("_cb").alias("_eb"))
        .where(
            ((F.col("_i") < F.col("_j")) & (F.col("_ea") != F.col("_eb")))
            | (F.col("_ea") < F.col("_eb"))
        )
        .select(
            *payload,
            F.least("_ea", "_eb").alias(out_a),
            F.greatest("_ea", "_eb").alias(out_b),
        )
    )


def chunked_cartesian(df, arr_a, arr_b, out_a, out_b, payload=(), chunk=PAIR_CHUNK):
    """Element-level cartesian ``arr_a × arr_b`` per row with BOUNDED
    per-task expansion work — the cross-group sibling of
    chunked_self_pairs (same one-Generate-task pathology: a rep pair
    between two mega-groups expands k_a·k_b rows on one core). Slices
    both arrays, explodes to chunk pairs, repartitions by content hash
    (no round-robin determinism sort — see chunked_self_pairs), then
    explodes elements. Output: payload + (out_a, out_b), exactly the
    naive cartesian's rows; callers apply their own orientation rules.
    """
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    payload = list(payload)
    return (
        df.select(*payload, _chunks(arr_a, chunk).alias("_cha"), F.col(arr_b))
        .select(*payload, F.explode("_cha").alias("_ca"), _chunks(arr_b, chunk).alias("_chb"))
        .select(*payload, "_ca", F.explode("_chb").alias("_cb"))
        .repartition(p, F.xxhash64("_ca", "_cb"))
        .select(*payload, F.explode("_ca").alias(out_a), "_cb")
        .select(*payload, out_a, F.explode("_cb").alias(out_b))
    )


def expand_member_pairs(rep_pairs, g, payload, out_a, out_b):
    """Representative pairs → member pairs: the shared CROSS-GROUP
    expansion tail of every quotiented pair kernel. ``rep_pairs`` has
    (id1, id2, *payload) keyed by group gid; ``g`` carries (gid,
    members). Joins both member lists in, runs the chunked cartesian,
    and re-orients each pair by value — columns (out_a, out_b,
    *payload) with out_a < out_b, exactly the rows of the naive
    per-member join. One definition so a fix to the expansion (chunk
    size, orientation, a null guard) cannot drift across kernels.
    """
    payload = list(payload)
    cross_src = (
        rep_pairs.join(
            g.select(F.col("gid").alias("id1"), F.col("members").alias("mem_a")),
            "id1",
        )
        .join(
            g.select(F.col("gid").alias("id2"), F.col("members").alias("mem_b")),
            "id2",
        )
        .select(*payload, "mem_a", "mem_b")
    )
    return chunked_cartesian(
        cross_src, "mem_a", "mem_b", "_m1", "_m2", payload=payload
    ).select(
        F.least("_m1", "_m2").alias(out_a),
        F.greatest("_m1", "_m2").alias(out_b),
        *payload,
    )


def band_bucket_pairs(df, id_col, payload=(), sig_prefix="sig", n_bands=4):
    """Distinct co-bucketed pairs under 2-rows-per-band MinHash banding —
    the one definition of the md5-signature LSH candidate generator
    (the graph builders and the estimate kernel previously each inlined
    it, so the band count / row layout could drift between the kernels
    and the expanded-graph references verified against them).

    ``df`` carries ``id_col`` plus columns {sig_prefix}0..{2·n_bands-1};
    rows sharing BOTH signature values of any band pair up. Returns
    (id1, id2) with id1 < id2, plus ``{x}1``/``{x}2`` for each payload
    column x (taken from the id1/id2 side respectively). NULL signature
    rows pair with nothing (equi-join semantics) — pre-filter them only
    as an optimization.

    The row→band melt is ONE explode of an array of band structs, not an
    n_bands-way union of the input (optimization round 14). Two reasons:

    - Correctness under keyed inputs: with a hash-partitioned child (the
      ``tables.spread`` scans), the planner satisfied the final
      ``.distinct()``'s clustering requirement from the UNION's claimed
      partitioning and skipped its Exchange — but at runtime the union
      CONCATENATES its branches' partitions, so the same (id1, id2) pair
      produced by different bands sat in different partitions and the
      per-partition dedup kept up to n_bands copies of it (caught by
      tests/test_dup_density.py::test_pagerank_lumping_on_dup_corpus,
      where identical-signature docs co-bucket in every band). With one
      lineage the a-side stays partitioned by its id column, every
      (id1, ·) row lives in one partition, and the dedup is correct
      whether or not the planner inserts the exchange.
    - Cost: the union re-evaluated the signature subtree once per band
      per join side (column pruning specializes each branch to its two
      sig columns, so nothing is reusable) — the shingle explode ran
      n_bands× per side; the melt runs it once per side.
    """
    payload = list(payload)
    bands = df.select(
        id_col,
        *payload,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"),
                        F.col(f"{sig_prefix}{2 * b}").alias("_bk1"),
                        F.col(f"{sig_prefix}{2 * b + 1}").alias("_bk2"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_bs"),
    ).select(
        id_col,
        *payload,
        F.col("_bs._band").alias("_band"),
        F.col("_bs._bk1").alias("_bk1"),
        F.col("_bs._bk2").alias("_bk2"),
    )
    a, c = bands.alias("a"), bands.alias("c")
    return (
        a.join(
            c,
            (F.col("a._band") == F.col("c._band"))
            & (F.col("a._bk1") == F.col("c._bk1"))
            & (F.col("a._bk2") == F.col("c._bk2"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"c.{id_col}").alias("id2"),
            *[F.col(f"a.{x}").alias(f"{x}1") for x in payload],
            *[F.col(f"c.{x}").alias(f"{x}2") for x in payload],
        )
        .distinct()
    )


@query("llm_dedup_minhash")  # rows-only: hash internals are engine-specific
def llm_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup candidates — the path that scales to 100 TB.

    DataFrame-native MinHash-LSH, all JVM-side expressions:

    1. 3-word shingle sets (shingles, not unigrams: the fixture corpus
       shares one small vocabulary, so unigram LSH buckets degenerate
       toward all-pairs — measured >240 s; shingles are near-unique per
       doc and keep buckets tiny, the property that makes LSH linear on
       real corpora too).
    2. 16 minhashes per doc: min over shingles of xxhash64(shingle ⊕
       seed) — one exploded shuffle, 16 agg expressions.
    3. Banding: 4 bands × 4 rows; docs sharing any band hash become
       candidates via a bucket self-join (equi join on the band key —
       never an all-pairs scan; candidate volume scales with true-dup
       density, the 100 TB property).
    4. Exact shingle-Jaccard verification of candidates, keep dist ≤ 0.2.

    QUOTIENTED like the other dedup kernels: identical shingle sets get
    identical signatures, hence identical band buckets, so k exact
    copies of a doc put C(k,2) guaranteed-candidate pairs through the
    bucket self-join AND the verify join — quadratic in dup density,
    which is exactly the regime dedup runs in (the 100× stress corpus,
    100 copies per text, stalled here). Collapsing to one representative
    per distinct shingle set first makes signatures, banding, and
    verification run once per UNIQUE set; member pairs are expanded
    afterwards (within a group dist is exactly 0.0; a cross-group pair
    inherits its representatives' distance verbatim), via the chunked
    expansion so no mega-group serializes one Generate task. Output rows
    are bit-identical to the unquotiented join.

    Replaced pyspark.ml's MinHashLSH (≈8 s warm at sf0.1 in
    approxSimilarityJoin) with this ≈2 s pipeline; rows-only because the
    sketch choice is engine-specific, but the output is deterministic.
    """
    n_hashes, bands = 16, 4
    rows_per_band = n_hashes // bands
    d = (
        tables.spread(tables.load(spark, sf_dir, "documents"))
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("shingles"),
        )
    )
    g = (
        d.groupBy(F.array_sort("shingles").alias("_skey"))
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .select("gid", "members", F.col("_skey").alias("shingles"))
        # lazy: the first job materializes it (feeds sig, verify ×2,
        # expansion ×2); deterministic columns (sorted members, sorted
        # key as shingles — consumers are all set-ops) make racing
        # stages compute identical partitions
        .localCheckpoint(eager=False)
    )
    sh = g.select("gid", F.explode("shingles").alias("s"))
    sig = sh.groupBy("gid").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    band_rows = sig.select(
        "gid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("gid", "bb.band", "bb.bucket")
    cand = (
        band_rows.alias("x")
        .join(
            band_rows.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.gid") < F.col("y.gid")),
        )
        .select(F.col("x.gid").alias("id1"), F.col("y.gid").alias("id2"))
        .distinct()
    )
    verify = (
        cand.join(g.select(F.col("gid").alias("id1"), F.col("shingles").alias("sh1")), "id1")
        .join(g.select(F.col("gid").alias("id2"), F.col("shingles").alias("sh2")), "id2")
    )
    inter = F.size(F.array_intersect("sh1", "sh2"))
    jac = inter.cast("double") / (F.size("sh1") + F.size("sh2") - inter)
    rep_pairs = (
        verify.withColumn("jaccard_dist", F.round(1 - jac, 4))
        .where(F.col("jaccard_dist") <= 0.2)
        .select("id1", "id2", "jaccard_dist")
    )
    cross = expand_member_pairs(rep_pairs, g, ("jaccard_dist",), "id1", "id2")
    within = chunked_self_pairs(
        g.where(F.size("members") >= 2).select("members"), "members", "id1", "id2"
    ).select("id1", "id2", F.lit(0.0).alias("jaccard_dist"))
    return cross.unionByName(within)


@query(
    "llm_simhash",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
), hashed AS (
  SELECT doc_id, CAST('0x' || substring(md5(w), 1, 15) AS BIGINT) AS h
  FROM tok
), bits AS (
  SELECT doc_id, b.bit,
         CAST(sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END)
              AS BIGINT) AS vote
  FROM hashed, (SELECT unnest(generate_series(0, 15)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
            AS BIGINT) AS simhash16
FROM bits GROUP BY doc_id
""",
)
def llm_simhash(spark, sf_dir):
    """16-bit SimHash per document via token-hash bit voting.

    Cross-engine hashing: xxhash64 (Spark) and hash() (DuckDB) are
    different functions, so both sides derive the token hash from md5 —
    bit-identical everywhere — taking the first 60 bits as a long. In
    production the md5 would be swapped for xxhash64 (cheaper); the
    operator shape (explode → bit vote → reassemble) is unchanged.
    """
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    # 64-bit integer from the first 15 hex chars of md5 (fits in a long)
    h = F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )
    # Optimization round 14 (guide §2.3/§2.4): the bit voting ran as
    # crossJoin(16 bit rows) → groupBy(doc_id, bit) → groupBy(doc_id) —
    # 16× the token rows through the first exchange and a second
    # aggregate exchange after it. The votes are independent integer
    # sums, so ONE groupBy(doc_id) with 16 conditional-sum columns
    # computes the same values (integer addition, order-free) with one
    # exchange carrying 16 ints per doc and no row multiplication.
    votes = tok.withColumn("h", h).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(16)
        ]
    )
    code = None
    for b in range(16):
        term = F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        code = term if code is None else code + term
    return votes.select("doc_id", code.cast("long").alias("simhash16"))


@query(
    "llm_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(text))) AS fp_md5,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS fp_tokens
FROM documents
""",
)
def llm_fingerprint(spark, sf_dir):
    """Document fingerprints: exact-content md5 + order-insensitive
    token-set md5 (catalog identity for dedup bookkeeping)."""
    d = tables.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias("fp_md5"),
        # NULL text -> NULL fingerprint on BOTH columns: concat_ws would
        # swallow the NULL into md5('') here while DuckDB's
        # array_to_string(NULL) stays NULL — no content, no fingerprint
        F.when(
            F.col("text").isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.md5(
                F.concat_ws(
                    " ", F.sort_array(F.array_distinct(F.split("text", " ")))
                ).cast("binary")
            )
        ).alias("fp_tokens"),
    )


@query(
    "llm_ngram_jaccard",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
  FROM d
), tok AS (
  SELECT doc_id, lang, len(shingles) AS sz, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2,
         count(*) AS n_common
  FROM tok a JOIN tok b
    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
)
SELECT id1, id2,
       round(CAST(n_common AS DOUBLE) / (sz1 + sz2 - n_common), 6) AS jaccard
FROM common
WHERE CAST(n_common AS DOUBLE) / (sz1 + sz2 - n_common) >= 0.30
""",
)
def llm_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram (word-shingle) Jaccard pairs ≥ 0.30 via the shared
    prefix-filter kernel (PPJoin family) — candidates from an inverted
    index over each doc's RAREST shingles only, then exact verification
    on the full shingle arrays.

    Why not the plain inverted-index self-join (the round-2 design):
    counting common shingles through the index requires EVERY shared
    shingle occurrence as a join row, so one boilerplate shingle shared
    by k documents forces a k²-row bucket with no way to prune it — the
    hot-shingle scale hole. Here the index holds only each doc's prefix
    under the global (df ASC, shingle) order: a corpus-hot shingle sits
    at the tail of that order and drops out of every doc's prefix, so it
    generates NO candidate bucket at all, while the PPJoin prefix theorem
    (+ size filter) still guarantees every true τ=0.30 pair shares a
    prefix shingle — zero false negatives, and the per-candidate
    array_intersect verify recovers the exact Jaccard the oracle checks.
    """
    d = (
        tables.spread(tables.load(spark, sf_dir, "documents"))
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("toks"),
        )
    )
    return prefix_filter_pairs(d, tau=0.30)


@query(
    "llm_near_dup_auto",
    oracle="""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
  FROM d
), tok AS (
  SELECT doc_id, lang, len(shingles) AS sz, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sz AS sz1, b.sz AS sz2,
         count(*) AS n_common
  FROM tok a JOIN tok b
    ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
)
SELECT id1, id2,
       round(CAST(n_common AS DOUBLE) / (sz1 + sz2 - n_common), 6) AS jaccard
FROM common
WHERE CAST(n_common AS DOUBLE) / (sz1 + sz2 - n_common) >= 0.30
""",
)
def llm_near_dup_auto(spark, sf_dir):
    """Self-dispatching near-dup over 3-word shingles at τ=0.30 — the
    operator under test is the ``near_dup`` ROUTER (VERDICT round-12
    item 2), not a new similarity semantics: it measures the corpus's
    prefix-token df median and picks the exact prefix-filter rung or
    the MinHash-LSH rung automatically, so the 100 TB dedup ladder is
    one call instead of a runbook.

    Oracle premise: the fixture's shingle domain is df-sparse (median
    prefix df ≈ 1, far below PREFIX_DF_SATURATION — the invariant
    tests/test_near_dup_auto.py pins), so the router provably takes the
    EXACT rung here and the output equals the llm_ngram_jaccard exact
    join, SQL-expressible verbatim. The LSH route is exercised by the
    same test file on the saturated unigram framing of the same corpus
    (where the exact rung measured 54M dead candidates on the round-12
    rung) — deterministic, recall-approximate, precision-exact.
    """
    d = (
        tables.load(spark, sf_dir, "documents")
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0)),"
                " i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("toks"),
        )
    )
    return near_dup(d, tau=0.30)


@query(
    "llm_dedup_cluster",
    oracle="""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.95
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL
  SELECT id2 AS src, id1 AS dst FROM pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
), comp AS (
  SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node
)
SELECT c.doc_id, c.component, s.n AS component_size
FROM comp c
JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) s
  USING (component)
""",
)
def llm_dedup_cluster(spark, sf_dir):
    """Near-duplicate clustering: connected components over the ≥0.95
    Jaccard pair graph — the step that turns pair lists into keep-one-
    per-cluster decisions.

    Iterative min-label propagation (Pregel-lite) on the QUOTIENT graph:
    the pair kernel already groups identical token sets, and docs with
    identical sets are by definition in one component, so the iteration
    runs over group representatives only (gid = min member doc_id) and
    member labels are joined in afterwards. Labels are provably the same
    as doc-level propagation: a rep component's min gid IS the min doc_id
    of the expanded component, because every gid is its group's min. On
    dup-dense corpora this shrinks both the node and edge sets by the
    copy multiplicity before the O(diameter) rounds start. Each round is
    one distributed join + aggregate; localCheckpoint truncates the
    growing plan lineage — the standard shape for iterative algorithms on
    Spark at any scale. The oracle is DuckDB's recursive CTE over the
    doc-level edge set.
    """
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    g, rep_pairs = prefix_filter_pairs(d, tau=0.95, expand=False)
    pairs = rep_pairs.select("id1", "id2")
    # Lazy checkpoints: the convergence aggregate below is the action
    # that materializes each round's labels, so every round costs ONE
    # Spark job (checkpoint-then-agg was two; halved the fixed per-job
    # scheduling overhead that dominates the iteration at bench scale).
    #
    # Round-15 loop restructure (guide §2.4, VERDICT r14 item 2),
    # measured interleaved at sf0.1 (probe logs in OPTIMIZATION_r15.md):
    # 52 jobs -> 33 and the loop's per-round stage count drops, output
    # bit-identical on the full sf0.1 corpus:
    #
    # 1. SELF-LOOP edges (gid -> gid for every node) replace the
    #    per-round union-with-labels: min over in-neighbors' labels
    #    including self IS min(label(n), min over neighbors) — the same
    #    fixpoint iteration, one less scan+union per round.
    # 2. The edge table is hash-partitioned on dst so the per-round
    #    min-label aggregate needs NO exchange: the round joins labels
    #    BROADCAST (size-gated below) with edges as the stream side,
    #    which preserves the dst partitioning into groupBy(dst). The
    #    repartition is planned with AQE momentarily OFF because an
    #    AdaptiveSparkPlan hides its outputPartitioning from the
    #    checkpoint's LogicalRDD (probed: the claim reads
    #    UnknownPartitioning under AQE, hashpartitioning(dst, p)
    #    without) — only this trivial scan->exchange subplan loses AQE;
    #    the expensive candidate pipeline below it is checkpointed
    #    FIRST, under AQE, unchanged.
    # 3. labels/hop broadcasts are SIZE-GATED on the quotient row count
    #    (taken from the same init job as the convergence total, not an
    #    extra count): a rep-label row is two longs, so the cap keeps
    #    broadcasts ~32 MB; above it the loop falls back to plain joins
    #    — the 100 TB shape, where AQE picks the join strategy.
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_raw = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(
            pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        )
        .unionByName(g.select(F.col("gid").alias("src"), F.col("gid").alias("dst")))
        .localCheckpoint(eager=False)
    )
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = edges_raw.repartition(p, F.col("dst")).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
    labels = g.select(
        F.col("gid").alias("node"), F.col("gid").alias("label")
    ).localCheckpoint(eager=False)
    # Iterate to convergence; the bound is a safety valve only.
    # Measured round counts (round 12): the sf fixtures need 9 plain
    # min-label rounds (the old "near-cliques, 1-3 rounds" claim was
    # wrong — quotient reps chain), and the dup-free rung's similarity
    # graph is long CHAINS where O(diameter) rounds × per-round job
    # overhead dominates. ADAPTIVE POINTER DOUBLING: from round 4 on
    # (early doubling joins the still-large label table and measured
    # SLOWER: 17.1 vs 7.2 s at sf0.1), each round also jumps every
    # node to its label's OWN label (label ← min(label,
    # label[label])), halving the distance to the component minimum
    # per round — O(log diameter) total. Same-session measurements:
    # sf0.1 9 rounds/8.5 s plain → 6 rounds/7.2 s doubled; the 5k-doc
    # dup-free rung 19.3 → 16.7 s; the 50k-doc rung 956 → 681 s (48g
    # driver; that rung needs the heap either way — its 268M-candidate
    # prefix join OOMs a default-1g local JVM before the loop runs,
    # loop variant irrelevant — probed both).
    # Invariant both steps preserve: label(n) is always a gid inside
    # n's component and only ever decreases, so the fixpoint (stable
    # under neighbor-min AND label-of-label) is the component-min
    # gid, exactly as before — and the doubling join always matches,
    # because every label VALUE is a gid that has its own labels row.
    # Exiting at the cap with changes still pending would silently
    # mislabel a component, so that raises.
    # Convergence detection: labels only ever DECREASE, so the exact
    # (decimal) label total strictly decreases until fixpoint — one
    # aggregate per round instead of a full old-vs-new join.
    max_rounds = 50
    double_after = 3
    # Fused init (round 15): the convergence total and the broadcast
    # size gate come out of ONE aggregate job. A NULL-gid singleton (a
    # null-keyed doc with NULL doc_id) contributes nothing to the sum
    # and never equi-joins below — exactly as the old union form, whose
    # NULL label row also dropped at the final members join.
    init = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("t"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    prev_total, n_reps = init.t, init.n
    small = n_reps <= LABEL_BROADCAST_CAP
    converged = False
    for rnd in range(max_rounds):
        lab = F.broadcast(labels) if small else labels
        stepped = (
            edges.join(lab, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if rnd >= double_after:
            hop = stepped.select(
                F.col("node").alias("_ln"), F.col("label").alias("_ll")
            )
            if small:
                hop = F.broadcast(hop)
            stepped = stepped.join(
                hop, stepped.label == F.col("_ln")
            ).select(
                "node", F.least("label", "_ll").alias("label")
            )
        labels = stepped.localCheckpoint(eager=False)
        total = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("t")
        ).collect()[0].t
        if total == prev_total:
            converged = True
            break
        prev_total = total
    if not converged:
        raise RuntimeError(
            f"llm_dedup_cluster: label propagation did not converge in "
            f"{max_rounds} rounds"
        )
    # expand representative labels to every group member, then size the
    # components over DOCS (not groups)
    members = g.select(F.col("gid").alias("node"), F.explode("members").alias("doc_id"))
    doc_labels = members.join(labels, "node").select(
        "doc_id", F.col("label").alias("component")
    )
    w = Window.partitionBy("component")
    return doc_labels.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).alias("component_size"),
    )


@query(
    "llm_dedup_canonical",
    oracle="""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= 0.95
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL
  SELECT id2 AS src, id1 AS dst FROM pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
), comp AS (
  SELECT node AS doc_id, min(label) AS canonical_id FROM walk GROUP BY node
)
SELECT doc_id, canonical_id,
       (doc_id = canonical_id) AS is_canonical,
       count(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM comp
""",
)
def llm_dedup_canonical(spark, sf_dir):
    """The dedup DECISION: every document mapped to its cluster's
    canonical representative (min doc_id — deterministic, join-stable)
    with a keep/drop flag — the table a corpus build actually filters on
    (`WHERE is_canonical`) and the provenance record for the rest.
    Composition of the quotient-graph connected components with a flag
    projection; at scale this is the same cost as llm_dedup_cluster plus
    one narrow map."""
    clustered = llm_dedup_cluster(spark, sf_dir)
    return clustered.select(
        "doc_id",
        F.col("component").alias("canonical_id"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
        F.col("component_size").alias("cluster_size"),
    )


@query(
    "llm_winnow_fingerprint",
    oracle="""
WITH w AS (
  -- coalesce: a NULL text must keep its single empty partial window
  -- (the old LATERAL form's greatest(NULL, 1) = 1 row semantics);
  -- unnest of a NULL list would drop the doc entirely
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
  FROM documents
), tok AS (
  -- linear tokenization: the old form indexed toks[i] from a LATERAL
  -- generate_series, which re-scans/copies the whole list per row —
  -- quadratic on a megadoc (the giant-doc corpus hung here). unnest
  -- + window leads build the same shingles in one linear pass.
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p,
         unnest(toks) AS t, len(toks) AS n_toks
  FROM w
), sh AS (
  SELECT doc_id, p AS pos,
         concat_ws(' ', t, lead(t) OVER win, lead(t, 2) OVER win) AS s,
         greatest(n_toks - 2, 1) AS n_sh
  FROM tok
  WINDOW win AS (PARTITION BY doc_id ORDER BY p)
  QUALIFY p <= greatest(n_toks - 3, 0)
), hashed AS (
  SELECT doc_id, pos, n_sh,
         CAST('0x' || substring(md5(s), 1, 8) AS BIGINT) * 100000
           + (99999 - pos) AS sel
  FROM sh
), wins AS (
  SELECT doc_id, pos, n_sh,
         min(sel) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed
), picked AS (
  SELECT DISTINCT doc_id, fp
  FROM wins WHERE pos <= greatest(n_sh - 4, 0)
)
SELECT doc_id,
       count(*) AS n_fp,
       md5(array_to_string(list_sort(list(fp)), ',')) AS fp_md5
FROM picked GROUP BY doc_id
""",
)
def llm_winnow_fingerprint(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): hash every 3-word shingle, slide a
    4-hash window, keep each window's minimum — guaranteeing any
    sufficiently long match between two documents shares a fingerprint,
    at ~2/(w+1) the storage of the full shingle set. The classic local
    fingerprint for partial-overlap/plagiarism-style dedup, complementing
    MinHash (whole-set similarity) in the ladder.

    Engine parity: the hash is the md5-prefix integer (same recipe as
    the split/sample primitives); winnowing's rightmost-minimum tie rule
    is encoded arithmetically — selection key hash·1e5 + (99999 - pos),
    so an ordinary window MIN picks min hash with largest position on
    ties, identically in both engines, all integer. Short docs (<4
    shingles) keep their single partial window (pos 0), documented rule
    on both sides. Plan shape: narrow map + one windowed min over a
    per-doc sort + one aggregate — linear, doc-partitioned, skew-free."""
    d = (
        tables.spread(tables.load(spark, sf_dir, "documents"))
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, greatest(size(_toks)-3, 0)),"
                    " i -> concat_ws(' ', slice(_toks, i+1, 3)))"
                )
            ).alias("pos", "s"),
        )
    )
    n_sh = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    sel = (
        F.conv(F.substring(F.md5(F.col("s").cast("binary")), 1, 8), 16, 10).cast(
            "long"
        )
        * 100000
        + (F.lit(99999) - F.col("pos"))
    )
    hashed = d.select(
        "doc_id", "pos", n_sh.alias("n_sh"), sel.alias("sel")
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, 3)
    )
    picked = (
        hashed.select(
            "doc_id",
            "pos",
            "n_sh",
            F.min("sel").over(win).alias("fp"),
        )
        .where(F.col("pos") <= F.greatest(F.col("n_sh") - 4, F.lit(0)))
        .select("doc_id", "fp")
        .distinct()
    )
    return picked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list("fp"))).cast("binary")
        ).alias("fp_md5"),
    )


_SIG_ARROW_SCHEMA = "doc_id long, " + ", ".join(
    f"sig{i} long" for i in range(8)
)


def _minhash_sig_rows(d):
    """Per-ROW salted-md5 MinHash signatures via one mapInArrow pass
    (optimization round 15, guide §4.1/§4.2): for each (doc_id, text)
    row, the distinct 3-word shingles and the 8 per-salt minima are
    computed inside the kernel — hashlib md5 digests are byte-identical
    to ``F.md5`` and the md5-prefix integer is the digest's first 4
    bytes big-endian, so every value is bit-equal to the expression
    form's ``conv(substring(md5(..),1,8),16,10)``. A trailing
    groupBy(doc_id) min-aggregate preserves exact duplicate-doc_id
    merge semantics (the old explode+groupBy merged shingles across
    rows sharing a doc_id; unique ids — every current fixture — make
    it a cheap 8-longs-per-row pass-through aggregate).

    Expression-semantics corners, pinned by
    tests/test_plans.py::test_minhash_sig_rows_matches_expression_form:

    - ``split(text, ' ')`` keeps leading/trailing/adjacent empty tokens
      (Java limit=-1 regex split ≡ Python ``str.split(' ')``);
    - < 3 tokens ⇒ the single shingle joining ALL tokens
      (sequence(0, greatest(n-3, 0)) = [0], slice takes what exists);
    - NULL text ⇒ the [''] shingle, NOT a dropped row: size(NULL toks)
      is NULL, greatest(NULL-3, 0) = 0, and concat_ws over the NULL
      slice is '' (probed against the expression form — this is why
      every doc, even NULL text, carries a signature, the invariant
      llm_graph_pagerank's singleton path documents);
    - NULL doc_id rows keep their NULL key through the aggregate.

    The per-task shingle→hashes cache amortizes repeated shingles
    (boilerplate-dense corpora); it is size-bounded so a 100 TB
    partition cannot grow it without limit."""

    def kernel(batches):
        import hashlib

        import pyarrow as pa

        salts = [f"{i}:".encode() for i in range(8)]
        cache: dict = {}
        for b in batches:
            ids = b.column(0)
            texts = b.column(1)
            out_id = []
            out = [[] for _ in range(8)]
            for j in range(b.num_rows):
                t = texts[j].as_py()
                if t is None:
                    sh = {""}
                else:
                    toks = t.split(" ")
                    n = len(toks)
                    if n >= 3:
                        sh = {" ".join(toks[i : i + 3]) for i in range(n - 2)}
                    else:
                        sh = {" ".join(toks)}
                mins = [0x1_0000_0000] * 8  # > any 32-bit md5 prefix
                for s in sh:
                    vals = cache.get(s)
                    if vals is None:
                        sb = s.encode("utf-8")
                        vals = [
                            int.from_bytes(
                                hashlib.md5(p + sb).digest()[:4], "big"
                            )
                            for p in salts
                        ]
                        if len(cache) > 1_000_000:
                            cache.clear()
                        cache[s] = vals
                    for k in range(8):
                        v = vals[k]
                        if v < mins[k]:
                            mins[k] = v
                out_id.append(ids[j].as_py())
                for k in range(8):
                    out[k].append(mins[k])
            yield pa.record_batch(
                [pa.array(out_id, pa.int64())]
                + [pa.array(c, pa.int64()) for c in out],
                names=["doc_id"] + [f"sig{i}" for i in range(8)],
            )

    rows = d.select("doc_id", "text").mapInArrow(kernel, _SIG_ARROW_SCHEMA)
    return rows.groupBy("doc_id").agg(
        *[F.min(f"sig{i}").alias(f"sig{i}") for i in range(8)]
    )


@query(
    "llm_minhash_signature",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS s
  FROM w
)
SELECT doc_id,
       min(CAST('0x' || substring(md5('0:' || s), 1, 8) AS BIGINT)) AS sig0,
       min(CAST('0x' || substring(md5('1:' || s), 1, 8) AS BIGINT)) AS sig1,
       min(CAST('0x' || substring(md5('2:' || s), 1, 8) AS BIGINT)) AS sig2,
       min(CAST('0x' || substring(md5('3:' || s), 1, 8) AS BIGINT)) AS sig3,
       min(CAST('0x' || substring(md5('4:' || s), 1, 8) AS BIGINT)) AS sig4,
       min(CAST('0x' || substring(md5('5:' || s), 1, 8) AS BIGINT)) AS sig5,
       min(CAST('0x' || substring(md5('6:' || s), 1, 8) AS BIGINT)) AS sig6,
       min(CAST('0x' || substring(md5('7:' || s), 1, 8) AS BIGINT)) AS sig7
FROM sh GROUP BY doc_id
""",
)
def llm_minhash_signature(spark, sf_dir):
    """Value-verifiable MinHash signatures: 8 permutations simulated by
    salted md5-prefix hashes (salt i prepended to the shingle), each
    signature the min over the doc's distinct 3-gram shingles — the
    estimator behind llm_dedup_minhash's LSH banding, here with an exact
    cross-engine oracle because the hash family is the engine-independent
    md5 primitive rather than a JVM-internal hash. P[sig_i(A)=sig_i(B)] =
    J(A,B), so signature agreement rates estimate Jaccard; the LSH key
    buckets these same signatures.

    Optimization round 15 (guide §4.1/§4.2, VERDICT r14 item 3): the
    shingle explode + 8-salt md5/conv/substring expression tree — ~8
    interpreted md5 chains per shingle row, the measured ~2.3 s kernel
    shared by the pagerank/estimate/incremental consumers — is replaced
    by ``_minhash_sig_rows``, one mapInArrow pass (hashlib md5 is
    byte-identical to ``F.md5``; same trick as ``srp_codes``). The
    trailing groupBy(doc_id) min-aggregate is kept for exact duplicate-
    doc_id semantics, but it now aggregates 8 longs per ROW instead of
    8 salted hashes per SHINGLE row — the explode and the per-shingle
    hashing are gone from the plan."""
    # spread the single-file scan BEFORE the kernel (guide §2.5 input
    # skew): the fixture arrives as ONE scan task otherwise.
    d = tables.spread(tables.load(spark, sf_dir, "documents"))
    return _minhash_sig_rows(d)


@query(
    "llm_minhash_estimate",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS s
  FROM w
), sig AS (
  SELECT doc_id,
         min(CAST('0x' || substring(md5('0:' || s), 1, 8) AS BIGINT)) AS sig0,
         min(CAST('0x' || substring(md5('1:' || s), 1, 8) AS BIGINT)) AS sig1,
         min(CAST('0x' || substring(md5('2:' || s), 1, 8) AS BIGINT)) AS sig2,
         min(CAST('0x' || substring(md5('3:' || s), 1, 8) AS BIGINT)) AS sig3,
         min(CAST('0x' || substring(md5('4:' || s), 1, 8) AS BIGINT)) AS sig4,
         min(CAST('0x' || substring(md5('5:' || s), 1, 8) AS BIGINT)) AS sig5,
         min(CAST('0x' || substring(md5('6:' || s), 1, 8) AS BIGINT)) AS sig6,
         min(CAST('0x' || substring(md5('7:' || s), 1, 8) AS BIGINT)) AS sig7
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b,
         CASE b WHEN 0 THEN sig0 WHEN 1 THEN sig2 WHEN 2 THEN sig4 ELSE sig6 END AS k1,
         CASE b WHEN 0 THEN sig1 WHEN 1 THEN sig3 WHEN 2 THEN sig5 ELSE sig7 END AS k2
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.k1 = c.k1 AND a.k2 = c.k2 AND a.doc_id < c.doc_id
), scored AS (
  SELECT doc_a, doc_b,
         CAST(sa.sig0 = sb.sig0 AS INT) + CAST(sa.sig1 = sb.sig1 AS INT)
       + CAST(sa.sig2 = sb.sig2 AS INT) + CAST(sa.sig3 = sb.sig3 AS INT)
       + CAST(sa.sig4 = sb.sig4 AS INT) + CAST(sa.sig5 = sb.sig5 AS INT)
       + CAST(sa.sig6 = sb.sig6 AS INT) + CAST(sa.sig7 = sb.sig7 AS INT)
         AS n_agree
  FROM cand
  JOIN sig sa ON cand.doc_a = sa.doc_id
  JOIN sig sb ON cand.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, n_agree, n_agree / 8.0 AS est_jaccard
FROM scored WHERE n_agree >= 4
""",
)
def llm_minhash_estimate(spark, sf_dir):
    """End-to-end MinHash similarity estimation with an exact oracle:
    LSH banding (4 bands x 2 rows over the 8 salted-md5 signatures)
    generates candidate pairs, then each candidate's Jaccard similarity
    is estimated by its signature agreement rate (P[sig_i(A)=sig_i(B)] =
    J(A,B)); pairs agreeing on >= 4 of 8 signatures survive. This is the
    full production LSH rung — candidates + estimate + threshold — made
    value-verifiable by the engine-independent md5 hash family.

    Scale shape: signatures are one explode + one 8-way min aggregate
    (linear, map-side combinable); banding shuffles 2 longs per (doc,
    band); the self-join only pairs docs inside a bucket (never
    all-pairs); the estimate join is doc-keyed against the
    signature table (8 longs per doc). No verification pass touches
    document text — the whole pipeline runs on the 72-byte sketch.
    """
    # QUOTIENTED by full signature (the dedup-kernel pattern): docs with
    # identical signatures share every band bucket AND agree on all 8
    # sigs, so a k-member signature class contributes C(k,2)
    # guaranteed-survivor pairs — quadratic in duplicate density if the
    # bucket self-join and the two signature joins run at doc level (the
    # 100× stress corpus spent 51 s mostly re-deriving n_agree = 8 for
    # copy pairs). Banding, candidate generation, and the agreement
    # joins run once per unique signature; member pairs are pure output
    # expansion (within a class n_agree is 8 by construction; a
    # cross-class pair inherits its representatives' n_agree verbatim).
    sig_cols = [f"sig{i}" for i in range(8)]
    # NULL-signature guard (the prefix_filter_pairs / pagerank pattern):
    # a shingle-less doc has all-NULL sigs; the doc-level kernel never
    # pairs it (NULL band keys don't equi-join), but groupBy treats NULL
    # keys as equal and would merge every such doc into ONE quotient
    # class whose `within` expansion invents n_agree=8 pairs. Drop them
    # before quotienting — they can contribute no candidate by
    # construction. Unreachable on current fixtures (every doc shingles
    # to at least ['']); defensive against corpus drift.
    sig = llm_minhash_signature(spark, sf_dir).where(F.col("sig0").isNotNull())
    g = (
        sig.groupBy(*sig_cols)
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        # lazy + sorted members: first job materializes it (feeds
        # banding + both expansions); deterministic rows, so racing
        # stages compute identical partitions
        .localCheckpoint(eager=False)
    )
    cand = band_bucket_pairs(g, "gid")
    sa = g.alias("sa")
    sb = g.alias("sb")
    n_agree = None
    for i in range(8):
        term = (F.col(f"sa.sig{i}") == F.col(f"sb.sig{i}")).cast("int")
        n_agree = term if n_agree is None else n_agree + term
    rep_pairs = (
        cand.join(sa, cand.id1 == F.col("sa.gid"))
        .join(sb, cand.id2 == F.col("sb.gid"))
        .select("id1", "id2", n_agree.alias("n_agree"))
        .where(F.col("n_agree") >= 4)
    )
    cross = expand_member_pairs(rep_pairs, g, ("n_agree",), "doc_a", "doc_b")
    within = chunked_self_pairs(
        g.where(F.size("members") >= 2).select("members"),
        "members",
        "doc_a",
        "doc_b",
    ).select("doc_a", "doc_b", F.lit(8).cast("integer").alias("n_agree"))
    return cross.unionByName(within).select(
        "doc_a",
        "doc_b",
        "n_agree",
        (F.col("n_agree") / 8.0).alias("est_jaccard"),
    )


@query(
    "llm_incremental_dedup",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 1)),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS s
  FROM w
), sig AS (
  SELECT doc_id,
         min(CAST('0x' || substring(md5('0:' || s), 1, 8) AS BIGINT)) AS sig0,
         min(CAST('0x' || substring(md5('1:' || s), 1, 8) AS BIGINT)) AS sig1,
         min(CAST('0x' || substring(md5('2:' || s), 1, 8) AS BIGINT)) AS sig2,
         min(CAST('0x' || substring(md5('3:' || s), 1, 8) AS BIGINT)) AS sig3,
         min(CAST('0x' || substring(md5('4:' || s), 1, 8) AS BIGINT)) AS sig4,
         min(CAST('0x' || substring(md5('5:' || s), 1, 8) AS BIGINT)) AS sig5,
         min(CAST('0x' || substring(md5('6:' || s), 1, 8) AS BIGINT)) AS sig6,
         min(CAST('0x' || substring(md5('7:' || s), 1, 8) AS BIGINT)) AS sig7
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b,
         CASE b WHEN 0 THEN sig0 WHEN 1 THEN sig2 WHEN 2 THEN sig4 ELSE sig6 END AS k1,
         CASE b WHEN 0 THEN sig1 WHEN 1 THEN sig3 WHEN 2 THEN sig5 ELSE sig7 END AS k2
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)
)
SELECT n.doc_id AS new_doc_id,
       min(c.doc_id) AS matched_corpus_doc,
       count(DISTINCT c.doc_id) AS n_matches
FROM bands n JOIN bands c
  ON n.b = c.b AND n.k1 = c.k1 AND n.k2 = c.k2
WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 != 0
GROUP BY n.doc_id
""",
)
def llm_incremental_dedup(spark, sf_dir):
    """Incremental-ingest deduplication: a NEW batch (every 10th doc)
    probed against the EXISTING corpus's MinHash band index — the shape
    a continuously-fed training pipeline actually runs (the corpus index
    is persisted once; each arriving batch only hashes itself and joins
    the bucket index; it never rescans corpus text). Emits, per new doc
    that collides with the corpus in any band, the lowest matching
    corpus doc and the distinct-match count — the drop/keep decision
    input.

    Scale shape: batch-side signature cost is proportional to the BATCH,
    not the corpus; the probe is a bucket equi-join against the (doc,
    band, key) index — at 100 TB the index is the only corpus-sized
    artifact touched, and it shuffles on band-bucket keys exactly like
    llm_dedup_minhash's self-join, minus the self part."""
    sig = llm_minhash_signature(spark, sf_dir)
    # Row→band melt as ONE explode, not a 4-way union of sig
    # (optimization round 15, the band_bucket_pairs melt from r14): the
    # union re-evaluated the signature subtree once per branch — after
    # the Arrow signature kernel that is 4× the FULL 8-salt mapInArrow
    # pass, because an opaque kernel cannot be column-pruned the way the
    # old per-salt expression branches were (measured: the kernel
    # rewrite REGRESSED this key 1.6→2.2 s under the union; the melt
    # recovers it). One lineage also keeps the per-band rows of a doc in
    # one partition under keyed inputs.
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"sig{2 * b}").alias("k1"),
                        F.col(f"sig{2 * b + 1}").alias("k2"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_bb"),
    ).select("doc_id", "_bb.band", "_bb.k1", "_bb.k2")
    # lazy: both join sides read the same materialized partitions; rows
    # are deterministic (min-aggregate signatures), so the single
    # consuming job can safely materialize it in place
    bands = bands.localCheckpoint(eager=False)
    new = bands.where(F.col("doc_id") % 10 == 0).alias("n")
    corpus = bands.where(F.col("doc_id") % 10 != 0).alias("c")
    return (
        new.join(
            corpus,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.k1") == F.col("c.k1"))
            & (F.col("n.k2") == F.col("c.k2")),
        )
        .groupBy(F.col("n.doc_id").alias("new_doc_id"))
        .agg(
            F.min(F.col("c.doc_id")).alias("matched_corpus_doc"),
            F.countDistinct(F.col("c.doc_id")).alias("n_matches"),
        )
    )


@query(
    "llm_prefix_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id, text, n_chars FROM documents
), k AS (
  SELECT doc_id, text, n_chars,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS head5
  FROM d
), cand AS (
  SELECT a.doc_id AS short_doc, b.doc_id AS long_doc,
         a.text AS a_text, b.text AS b_text
  FROM k a JOIN k b
    ON a.head5 = b.head5 AND a.doc_id <> b.doc_id
   AND (len(a.text) < len(b.text)
        OR (len(a.text) = len(b.text) AND a.doc_id < b.doc_id))
)
SELECT short_doc, long_doc,
       len(a_text) AS prefix_len
FROM cand
WHERE substring(b_text, 1, len(a_text)) = a_text
""",
)
def llm_prefix_dedup(spark, sf_dir):
    """Truncation-duplicate detection: documents whose ENTIRE text is a
    prefix of another document — the snippet/preview/cut-off-crawl dup
    class that whole-document hashing misses (hashes differ) and
    Jaccard under-scores (the long doc dilutes the overlap). Pairs
    (short, long) where short's full text prefixes long's; equal-length
    pairs (exact dups) are oriented by id to avoid double-reporting.

    Scale shape: candidates are generated by a first-5-tokens bucket
    join — prefixes MUST share their opening tokens, so the bucket key
    is a provably complete blocking scheme (no false negatives) with
    bounded buckets on natural text; verification is one substring
    comparison per candidate, JVM-side. Never all-pairs."""
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    k = d.select(
        "doc_id",
        "text",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5)).alias("head5"),
    )
    a, b = k.alias("a"), k.alias("b")
    la, lb = F.length(F.col("a.text")), F.length(F.col("b.text"))
    cand = a.join(
        b,
        (F.col("a.head5") == F.col("b.head5"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & ((la < lb) | ((la == lb) & (F.col("a.doc_id") < F.col("b.doc_id")))),
    )
    return cand.where(
        F.expr("substring(b.text, 1, length(a.text))") == F.col("a.text")
    ).select(
        F.col("a.doc_id").alias("short_doc"),
        F.col("b.doc_id").alias("long_doc"),
        F.length(F.col("a.text")).alias("prefix_len"),
    )


@query(
    "llm_substring_dedup",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), tok AS (
  -- linear tokenization (the old LATERAL list_slice(toks, i, i+7)
  -- re-sliced the whole token list per generated row — quadratic on a
  -- megadoc; found by the round-10 giant-doc corpus)
  SELECT doc_id, generate_subscripts(toks, 1) AS p, unnest(toks) AS tk,
         len(toks) AS n_toks
  FROM t
), w AS (
  SELECT doc_id,
         md5(concat_ws(' ', tk,
                       lead(tk, 1) OVER win, lead(tk, 2) OVER win,
                       lead(tk, 3) OVER win, lead(tk, 4) OVER win,
                       lead(tk, 5) OVER win, lead(tk, 6) OVER win,
                       lead(tk, 7) OVER win)) AS wh
  FROM tok
  WINDOW win AS (PARTITION BY doc_id ORDER BY p)
  QUALIFY p <= n_toks - 7
), dup AS (
  SELECT wh FROM w GROUP BY wh HAVING count(DISTINCT doc_id) >= 2
), agg AS (
  SELECT w.doc_id,
         count(*) AS n_windows,
         CAST(sum(CASE WHEN dup.wh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows
  FROM w LEFT JOIN dup ON w.wh = dup.wh
  GROUP BY w.doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_windows, 0) AS n_windows,
       coalesce(agg.n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN coalesce(agg.n_windows, 0) = 0 THEN 0.0
            ELSE round(CAST(agg.n_dup_windows AS DOUBLE) / agg.n_windows, 6)
       END AS dup_ratio,
       CASE WHEN coalesce(agg.n_windows, 0) > 0
             AND CAST(agg.n_dup_windows AS DOUBLE) / agg.n_windows > 0.5
            THEN 'drop' ELSE 'keep' END AS verdict
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
""",
)
def llm_substring_dedup(spark, sf_dir):
    """Exact-substring duplication profiling à la Lee et al. (2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    k-token rolling window (k=8) is hashed; a window hash seen in ≥2
    DISTINCT documents marks a cross-document duplicated span, and each
    document reports its duplicated-window fraction plus a keep/drop
    verdict at the 50% threshold. This catches partial overlap (shared
    paragraphs, boilerplate, quote chains) that whole-document hashing
    misses entirely and Jaccard merely dilutes — the suffix-array
    substring dedup re-expressed as a shuffle-friendly hash plan.

    Scale shape: tokenize/slice/hash is a narrow JVM-side projection
    (transform over sequence — no Python), the explode is linear in
    corpus token count, and BOTH reductions are hash aggregates on the
    window-hash / doc key — no self-join and no pair materialization
    anywhere, so a hot window (site boilerplate shared by millions of
    docs) costs one aggregate row, not a k² bucket. The dup-hash side of
    the final equi-join carries only hashes with ≥2 distinct docs, a
    vanishing fraction of window volume on real corpora."""
    d = tables.spread(tables.load(spark, sf_dir, "documents")).select("doc_id", "text")
    # guard: Spark sequence(1, 0) is DESCENDING [1, 0], not empty like
    # DuckDB generate_series — a ≤7-token (or NULL-text) doc would emit
    # two phantom md5('') windows and diverge from the oracle's zero
    wins = d.withColumn("_toks", F.split("text", " ")).select(
        "doc_id",
        F.explode(
            F.when(
                F.size(F.col("_toks")) >= 8,
                F.expr(
                    "transform(sequence(1, size(_toks) - 7),"
                    " i -> md5(concat_ws(' ', slice(_toks, i, 8))))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<string>)"))
        ).alias("wh"),
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("wh", F.lit(True).alias("is_dup"))
    )
    agg = (
        wins.join(dup, "wh", "left_outer")
        .withColumn("is_dup", F.coalesce("is_dup", F.lit(False)))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dup_windows"),
        )
    )
    ratio = F.col("n_dup_windows").cast("double") / F.col("n_windows")
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.round(ratio, 6))
            .alias("dup_ratio"),
            F.when(
                (F.coalesce("n_windows", F.lit(0)) > 0) & (ratio > 0.5),
                "drop",
            )
            .otherwise("keep")
            .alias("verdict"),
        )
    )


@query(
    "llm_dedup_bloom",
    oracle="""
WITH corpus AS (
  SELECT md5(text) AS h FROM documents WHERE doc_id >= 100
), corpus_pos AS (
  SELECT DISTINCT
         CAST('0x' || substring(md5(CAST(k AS VARCHAR) || ':' || h), 1, 15)
              AS BIGINT) % 65536 AS pos
  FROM corpus, unnest([0, 1, 2, 3]) AS t(k)
), batch AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN text ELSE text || ' zz' END AS btext
  FROM documents WHERE doc_id < 100
), bpos AS (
  SELECT doc_id, k,
         CAST('0x' || substring(md5(CAST(k AS VARCHAR) || ':' || md5(btext)), 1, 15)
              AS BIGINT) % 65536 AS pos
  FROM batch, unnest([0, 1, 2, 3]) AS t(k)
), hits AS (
  SELECT b.doc_id, count(*) AS n_hits
  FROM bpos b JOIN corpus_pos c ON b.pos = c.pos
  GROUP BY b.doc_id
)
SELECT batch.doc_id,
       coalesce(hits.n_hits, 0) = 4 AS might_be_dup,
       EXISTS (SELECT 1 FROM corpus WHERE corpus.h = md5(batch.btext))
         AS is_true_dup
FROM batch LEFT JOIN hits ON batch.doc_id = hits.doc_id
""",
)
def llm_dedup_bloom(spark, sf_dir):
    """Bloom-filter incremental dedup — the SKETCH membership path next
    to llm_incremental_dedup's exact join. The corpus (doc_id ≥ 100)
    builds a 65536-bit Bloom filter with 4 md5-derived hash functions; an
    arriving batch (doc_id < 100, odd ids mutated so half are genuinely
    novel) is screened against it: all-4-bits-set → might_be_dup. The
    output carries the exact verdict too, so the oracle checks the
    guarantee that MATTERS about a Bloom filter: zero false NEGATIVES
    (every true dup flagged), false positives possible and visible.

    Spark-first shape: the filter is built as a DataFrame — explode the 4
    bit positions per corpus doc, DISTINCT them (bounded by the 65536-bit
    space, like llm_semantic_dedup's code space) — and membership is a
    broadcast join of batch positions against that bounded set, grouped
    back per doc. No driver-side filter object, no row-at-a-time UDF; on
    a cluster the distinct position set IS the serialized filter, and it
    merges across corpus partitions for free (map-side combine), which is
    the mergeability property production bloom builds rely on.
    """
    d = tables.load(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") >= 100).select(
        F.md5(F.col("text").cast("binary")).alias("h")
    )

    def positions(hcol):
        return F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{k}:"), hcol).cast("binary")),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 65536
                )
                for k in range(4)
            ]
        )

    corpus_pos = (
        corpus.select(F.explode(positions(F.col("h"))).alias("pos")).distinct()
    )
    batch = d.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" zz")))
        .alias("btext"),
    )
    bh = batch.select(
        "doc_id",
        F.md5(F.col("btext").cast("binary")).alias("bh"),
    )
    bpos = bh.select(
        "doc_id", "bh", F.explode(positions(F.col("bh"))).alias("pos")
    )
    hits = (
        bpos.join(F.broadcast(corpus_pos), "pos")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    exact = corpus.distinct().withColumnRenamed("h", "bh").withColumn(
        "is_true_dup", F.lit(True)
    )
    return (
        bh.join(hits, "doc_id", "left")
        .join(F.broadcast(exact), "bh", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) == 4).alias("might_be_dup"),
            F.coalesce(F.col("is_true_dup"), F.lit(False)).alias("is_true_dup"),
        )
    )


@query(
    "llm_paragraph_dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tok AS (
  -- linear segmentation (the old LATERAL w[(i*10+1):(i*10+10)] slice
  -- re-sliced the whole token list per row — quadratic on a megadoc;
  -- round-10 giant-doc corpus)
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS p, unnest(w) AS tk
  FROM toks
), paras AS (
  SELECT doc_id, CAST(p // 10 AS INT) AS para_id,
         string_agg(tk, ' ' ORDER BY p) AS para
  FROM tok GROUP BY doc_id, p // 10
), freq AS (
  SELECT para, count(*) AS n_occurrences, min(doc_id) AS first_doc
  FROM paras GROUP BY para
), flagged AS (
  SELECT p.doc_id, p.para_id,
         f.n_occurrences > 1
           AND NOT (p.doc_id = f.first_doc) AS is_dup
  FROM paras p JOIN freq f ON p.para = f.para
)
SELECT doc_id,
       count(*) AS n_paras,
       sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_paras,
       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) / count(*), 6)
         AS dup_fraction,
       sum(CASE WHEN is_dup THEN 1 ELSE 0 END) / count(*) > 0.3 AS drop_doc
FROM flagged GROUP BY doc_id
""",
)
def llm_paragraph_dedup(spark, sf_dir):
    """Paragraph/line-level exact dedup — the C4/Gopher repetition-removal
    step that document-level dedup cannot do: boilerplate paragraphs
    (headers, navigation, license blocks) repeat across otherwise-unique
    documents. The fixture text has no newlines, so 'paragraphs' are
    fixed 10-token segments; the real corpus swaps the segmenter for
    split-on-newline and nothing else changes. Each paragraph's corpus
    frequency is computed once (hash aggregate on the paragraph text —
    in production on its md5, same shuffle), every non-first occurrence
    is flagged, and documents with >30% duplicated paragraphs are marked
    for drop — C4 removes the lines, Gopher drops the doc; both
    decisions fall out of this table.

    Scale shape: one explode (bounded: tokens/10 rows per doc), one
    paragraph-keyed aggregate, one join back — all hash-shuffles on
    fine-grained keys, no pair explosion anywhere (frequency, not
    pairwise comparison, carries the signal).
    """
    d = tables.load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    paras = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1),"
                " i -> concat_ws(' ', slice(w, i * 10 + 1, 10)))"
            )
        ).alias("para_id", "para"),
    )
    freq = paras.groupBy("para").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("doc_id").alias("first_doc"),
    )
    flagged = paras.join(freq, "para").select(
        "doc_id",
        (
            (F.col("n_occurrences") > 1)
            & (F.col("doc_id") != F.col("first_doc"))
        ).alias("is_dup"),
    )
    dup_n = F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        dup_n.cast("long").alias("n_dup_paras"),
        F.round(dup_n / F.count(F.lit(1)), 6).alias("dup_fraction"),
        (dup_n / F.count(F.lit(1)) > 0.3).alias("drop_doc"),
    )


@query(
    "llm_dedup_editdist",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         substring(text, 1, 64) AS t64,
         len(string_split(text, ' ')) // 8 AS len_bucket,
         array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ')
           AS pfx
  FROM documents
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(a.t64, c.t64) AS BIGINT) AS edit_dist
FROM b a JOIN b c
  ON a.lang = c.lang AND a.len_bucket = c.len_bucket AND a.pfx = c.pfx
 AND a.doc_id < c.doc_id
WHERE levenshtein(a.t64, c.t64) <= 24
""",
)
def llm_dedup_editdist(spark, sf_dir):
    """Blocked fuzzy dedup by edit distance — rung 2.5 of the dedup
    ladder: candidate pairs come from an equi-join on a cheap blocking
    key (language, length bucket, first-2-token prefix), then the
    expensive Levenshtein verify runs ONLY inside blocks, on a bounded
    64-char prefix so per-pair cost is O(64²) regardless of document
    length. Pairs at distance ≤ 24 are near-dup edits (the fixture's
    shared-prefix docs land at 0; unrelated same-block docs at 40+).

    Scale shape: the equi self-join is one hash shuffle on the blocking
    key — candidate volume scales with true block collision density,
    never all-pairs (the same contract as the banded MinHash join);
    ``levenshtein`` is a JVM builtin inside codegen, no Python. At
    100 TB the blocker widens to LSH bands; the verify kernel is
    unchanged.

    QUOTIENTED on (blocking key, t64): the kernel's output depends on a
    doc only through that tuple, so k docs sharing it collapse to one
    representative — the Levenshtein verify (the O(64²) hot loop) runs
    once per UNIQUE tuple pair instead of once per doc pair (25M
    redundant verifies at the 100× stress scale, 168 s → rep count²),
    within-group pairs are distance-0 by construction, and cross-group
    member pairs inherit their representatives' distance verbatim.
    Member expansion is chunked (chunked_* helpers), so output rows are
    identical and no mega-group serializes one Generate task.
    """
    d = tables.load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # NULL text/lang rows never pair in the unquotiented kernel (every
    # equi-join conjunct with a NULL key is UNKNOWN) and the oracle's
    # join drops them the same way — but groupBy treats NULLs as EQUAL,
    # so without this filter two null-text docs would form one identity
    # group and the within-group expansion would invent a distance-0
    # pair neither reference emits. Filtering them out is exactly the
    # original semantics: null-keyed docs simply never appear in pairs.
    b = d.where(F.col("text").isNotNull() & F.col("lang").isNotNull()).select(
        "doc_id",
        "lang",
        F.substring("text", 1, 64).alias("t64"),
        (F.size(w) / 8).cast("int").alias("len_bucket"),
        F.concat_ws(" ", F.slice(w, 1, 2)).alias("pfx"),
    )
    g = (
        b.groupBy("lang", "len_bucket", "pfx", "t64")
        .agg(
            F.min("doc_id").alias("gid"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        # lazy + sorted members: first job materializes it (feeds
        # verify ×2, expansion ×3); deterministic rows under races
        .localCheckpoint(eager=False)
    )
    a, c = g.alias("a"), g.alias("c")
    dist = F.levenshtein(F.col("a.t64"), F.col("c.t64"))
    rep_pairs = (
        a.join(
            c,
            (F.col("a.lang") == F.col("c.lang"))
            & (F.col("a.len_bucket") == F.col("c.len_bucket"))
            & (F.col("a.pfx") == F.col("c.pfx"))
            & (F.col("a.gid") < F.col("c.gid")),
        )
        .where(dist <= 24)
        .select(
            F.col("a.gid").alias("id1"),
            F.col("c.gid").alias("id2"),
            dist.cast("long").alias("edit_dist"),
        )
    )
    cross = expand_member_pairs(rep_pairs, g, ("edit_dist",), "doc_a", "doc_b")
    within = chunked_self_pairs(
        g.where(F.size("members") >= 2).select("members"),
        "members",
        "doc_a",
        "doc_b",
    ).select("doc_a", "doc_b", F.lit(0).cast("long").alias("edit_dist"))
    return cross.unionByName(within)


@query(
    "llm_dedup_cross_source",
    oracle="""
WITH h AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
)
SELECT a.doc_id AS doc_a, a.source AS source_a,
       b.doc_id AS doc_b, b.source AS source_b
FROM h a JOIN h b
  ON a.h = b.h AND a.doc_id < b.doc_id AND a.source <> b.source
""",
)
def llm_dedup_cross_source(spark, sf_dir):
    """Cross-source exact duplicates: pairs of identical texts ingested
    from DIFFERENT sources (syndicated articles, mirrored sites) — the
    provenance-aware variant of exact dedup that decides which source's
    copy to keep and which crawl streams overlap. One hash shuffle on
    md5(text); the self-join runs inside hash buckets, so candidate
    volume is duplicate-cluster-bounded, never all-pairs. (The fixture
    corpus is duplicate-free at rest, so at rest this returns the empty
    relation on both engines — the hash check certifies the join
    semantics; multi-member clusters appear as soon as any re-ingest
    batch lands, as in ``llm_incremental_dedup``.)
    """
    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    a, b = d.alias("a"), d.alias("b")
    return a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.source") != F.col("b.source")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("a.source").alias("source_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("b.source").alias("source_b"),
    )


@query(
    "llm_containment_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingles
  FROM d
), tok AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), dfreq AS (
  SELECT s, count(*) AS df FROM tok GROUP BY s
), blk AS (
  SELECT doc_id, s FROM (
    SELECT t.doc_id, t.s,
           row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.s) AS rn
    FROM tok t JOIN dfreq f USING (s)
  ) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blk a JOIN blk b ON a.s = b.s AND a.doc_id < b.doc_id
), scored AS (
  SELECT c.id_a, c.id_b,
         len(x.shingles) AS sz_a, len(y.shingles) AS sz_b,
         len(list_intersect(x.shingles, y.shingles)) AS n_int
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b
)
SELECT CASE WHEN sz_a < sz_b OR (sz_a = sz_b AND id_a > id_b)
            THEN id_a ELSE id_b END AS contained_id,
       CASE WHEN sz_a < sz_b OR (sz_a = sz_b AND id_a > id_b)
            THEN id_b ELSE id_a END AS container_id,
       least(sz_a, sz_b) AS sz_contained,
       greatest(sz_a, sz_b) AS sz_container,
       round(CAST(n_int AS DOUBLE) / least(sz_a, sz_b), 6) AS containment
FROM scored
WHERE CAST(n_int AS DOUBLE) / least(sz_a, sz_b) >= 0.6
""",
)
def llm_containment_dedup(spark, sf_dir):
    """Asymmetric containment dedup: flag documents whose 3-gram shingle
    set is ≥60% contained in another document's — the subset-duplicate
    case (quote inside article, truncated crawl of a longer page) that
    symmetric Jaccard structurally misses (A⊂B with |B|≫|A| has high
    containment but low Jaccard).

    Candidates come from a rarest-shingle block index: each doc posts
    only its 2 globally-rarest shingles (df ASC, shingle ASC), and pairs
    must share a posted shingle — self-bounding buckets, since a
    boilerplate shingle is nobody's rarest (the PPJoin-prefix property).

    QUOTIENTED like the other dedup kernels: docs with identical
    shingle sets collapse to one representative BEFORE blocking and
    verification. Crucially ``df`` stays MEMBER-WEIGHTED (sum of group
    sizes per shingle — exactly the doc-level document frequency), so
    the rarest-2 posting order is bit-identical to the oracle's
    doc-level blocking; identical sets post identical shingles, so the
    group-pair candidate set is exactly the collapsed doc-pair set, and
    within-group pairs (containment 1.0 by definition) are emitted
    combinatorially. On dup-dense corpora — the only place containment
    dedup gets hard — verification work now tracks the number of
    DISTINCT shingle sets: the 10×-skew stress run dropped from 20.2 s
    (expanded form) to the quotient cost, while plain-corpus cost is
    one extra hash aggregate. Output rows are unchanged (the expansion
    applies the same (size, doc_id) contained-side rule per member
    pair).
    """
    d = (
        tables.spread(tables.load(spark, sf_dir, "documents"))
        .withColumn("_toks", F.split("text", " "))
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(0, greatest(size(_toks)-3, 0),"
                " 1), i -> concat_ws(' ', slice(_toks, i+1, 3))))"
            ).alias("shingles"),
        )
    )
    g = (
        d.groupBy(F.array_sort("shingles").alias("_skey"))
        .agg(
            F.min("doc_id").alias("gid"),
            F.collect_list("doc_id").alias("members"),
            F.first("shingles").alias("shingles"),
        )
        .select(
            "gid",
            "members",
            "shingles",
            F.size("members").cast("long").alias("m"),
            F.size("shingles").cast("long").alias("sz"),
        )
        .localCheckpoint(eager=False)
    )
    tok = g.select("gid", "m", F.explode("shingles").alias("s")).localCheckpoint(eager=False)
    # member-weighted document frequency == the oracle's doc-level df
    dfreq = tok.groupBy("s").agg(F.sum("m").alias("df"))
    w_grp = Window.partitionBy("gid").orderBy("df", "s")
    blk = (
        tok.join(dfreq, "s")
        .withColumn("rn", F.row_number().over(w_grp))
        .where(F.col("rn") <= 2)
        .select("gid", "s")
    )
    cand = (
        blk.alias("a")
        .join(blk.alias("b"), "s")
        .where(F.col("a.gid") < F.col("b.gid"))
        .select(F.col("a.gid").alias("ga"), F.col("b.gid").alias("gb"))
        .distinct()
    )
    n_int = (
        cand.join(tok.select(F.col("gid").alias("ga"), "s"), "ga")
        .join(tok.select(F.col("gid").alias("gb"), "s"), ["gb", "s"])
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    meta = g.select("gid", "members", "sz")
    scored = (
        n_int.join(
            meta.select(
                F.col("gid").alias("ga"),
                F.col("members").alias("mem_a"),
                F.col("sz").alias("sz_a"),
            ),
            "ga",
        )
        .join(
            meta.select(
                F.col("gid").alias("gb"),
                F.col("members").alias("mem_b"),
                F.col("sz").alias("sz_b"),
            ),
            "gb",
        )
        .where(
            F.col("n_int").cast("double") / F.least("sz_a", "sz_b") >= 0.6
        )
    )
    # cross-group expansion: every member pair, same (size, id) rule
    # (chunked: a mega-group rep pair must not expand k_a·k_b rows
    # inside one Generate task — see chunked_cartesian)
    cross = chunked_cartesian(
        scored.select("sz_a", "sz_b", "n_int", "mem_a", "mem_b"),
        "mem_a",
        "mem_b",
        "id_a",
        "id_b",
        payload=("sz_a", "sz_b", "n_int"),
    )
    a_contained = (F.col("sz_a") < F.col("sz_b")) | (
        (F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") > F.col("id_b"))
    )
    cont = F.col("n_int").cast("double") / F.least("sz_a", "sz_b")
    cross_rows = cross.select(
        F.when(a_contained, F.col("id_a")).otherwise(F.col("id_b")).alias(
            "contained_id"
        ),
        F.when(a_contained, F.col("id_b")).otherwise(F.col("id_a")).alias(
            "container_id"
        ),
        F.least("sz_a", "sz_b").cast("long").alias("sz_contained"),
        F.greatest("sz_a", "sz_b").cast("long").alias("sz_container"),
        F.round(cont, 6).alias("containment"),
    )
    # within-group pairs: identical sets, containment exactly 1.0;
    # contained side = larger doc_id (sizes tie)
    within = chunked_self_pairs(
        g.where(F.col("m") >= 2).select("sz", "members"),
        "members",
        "id_a",
        "id_b",
        payload=("sz",),
    ).select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        F.col("sz").alias("sz_contained"),
        F.col("sz").alias("sz_container"),
        F.lit(1.0).alias("containment"),
    )
    return cross_rows.unionByName(within)
