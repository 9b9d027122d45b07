"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup.

Design rules for 100 TB:
  * every hash is md5/xxhash over deterministic strings — idempotent re-runs
    and (for md5) bit-identical DuckDB oracles;
  * candidate generation never goes quadratic: LSH bands / hash buckets
    first, pairwise verification only within buckets;
  * the only shuffles are the groupBys on bucket keys (salted by the band
    index by construction — band id is part of the key, so hot buckets
    split across bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.text import tokens_col


# ---------------------------------------------------------------------------
# Exact dedup (hash groupBy)
# ---------------------------------------------------------------------------
def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """-> (fp, n_docs, keep_id): one row per distinct content hash.

    Map-side partial aggregation handles the shuffle; the hot-key case
    (one document duplicated millions of times) is bounded because the
    aggregate is associative (count/min)."""
    fp = F.md5(F.col(text_col))
    return (
        docs.select(fp.alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one document per distinct text (the min id)."""
    w = exact_dedup_groups(docs, text_col, id_col)
    return docs.join(
        w.select(F.col("keep_id").alias(id_col)), id_col, "inner"
    )


# ---------------------------------------------------------------------------
# Token-set / n-gram Jaccard
# ---------------------------------------------------------------------------
def shingles_col(text: Column, n: int) -> Column:
    """Word n-gram shingles (n=1 -> token set), O(len) per row."""
    from rdf_mapper_spark.ops.text import ngrams_col

    toks = tokens_col(text)
    return F.array_distinct(ngrams_col(toks, n))


def jaccard_pairs(docs: DataFrame, threshold: float, n: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  stop_df_frac: float | None = None) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold.

    Inverted-index join: explode shingles -> self-join per shingle ->
    count shared shingles per pair -> Jaccard from |A|,|B|,|A∩B|.
    Shuffle key is the shingle, so common shingles are the skew risk.

    ``stop_df_frac`` is the skew kill-switch for scale: shingles whose
    document frequency exceeds ``stop_df_frac * n_docs`` are dropped from
    the inverted index BEFORE the self-join (a stop-shingle contributes
    O(df^2) candidate pairs — one shingle in 1% of 10^9 docs is 10^14
    pairs).  The exact Jaccard of surviving pairs is then computed against
    the FULL shingle sets via an array intersection on the pair, so the
    filter only loses pairs whose entire overlap is stop-shingles — by
    construction pairs of near-duplicate documents share rare shingles
    too.  None (default) keeps the exact verifier semantics.
    """
    base = docs.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    ex = base.select("id", "sz", F.explode("sh").alias("s"))
    if stop_df_frac is not None:
        n_docs = docs.count()
        cap = max(2, int(stop_df_frac * n_docs))
        live = (
            ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= cap)
            .select("s")
        )
        ex = ex.join(live, "s")  # shuffle on shingle, bounded per key
    a = ex.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "s")
    b = ex.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if stop_df_frac is not None:
        # candidate pairs only; recompute the TRUE intersection including
        # stop-shingles so the reported Jaccard is exact
        cand = inter.select("id_a", "id_b").distinct()
        sa = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                         F.col("sz").alias("sz_a"))
        sb = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                         F.col("sz").alias("sz_b"))
        inter = (
            cand.join(sa, "id_a").join(sb, "id_b")
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .select("id_a", "id_b", "sz_a", "sz_b", "inter")
        )
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signature(docs: DataFrame, num_hashes: int = 16, n: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """-> (id, sig: array<string>) — md5-based minhash per hash function.

    h_i(shingle) = md5(i || ':' || shingle); the signature element is the
    minimum digest string. md5 keeps the whole construction reproducible in
    DuckDB for oracle checks; swap in xxhash64 for raw speed in production.
    """
    sh = shingles_col(F.col(text_col), n)

    # let-binding (see ops/text.winnow_fingerprints): bind the shingle
    # array once as a lambda variable — referencing `sh` in each of the
    # num_hashes subtrees would rebuild the n-gram chain per hash function
    # (interpreted HOFs get no CSE)
    def _sig(shv: Column) -> Column:
        return F.array(*[
            F.array_min(F.transform(shv, _minhash_fn(i)))
            for i in range(num_hashes)
        ])

    sig = F.element_at(F.transform(F.array(sh), _sig), 1)
    return docs.select(F.col(id_col).alias("id"), sig.alias("sig"))


def _minhash_fn(i: int):
    return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))


def lsh_buckets(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """Band the signature -> (id, band, bucket). Bucket = md5 of the band
    slice, so the groupBy key space is uniform.

    ONE posexplode projection, not a union of per-band selects: a union
    re-evaluates the signature subtree (the expensive per-shingle md5
    chain, when fused with minhash_signature) once per band — the
    explode form evaluates it once per row (guide §2.3: don't compute
    things you throw away)."""
    sig_len_col = F.size("sig")
    # derive rows-per-band from the row's signature length lazily:
    # signatures are fixed-length arrays built by minhash_signature
    def band_bucket(b: int) -> Column:
        start = F.lit(b).cast("int") * (sig_len_col / F.lit(bands)).cast("int") + 1
        width = (sig_len_col / F.lit(bands)).cast("int")
        return F.md5(F.array_join(F.slice(F.col("sig"), start, width), "|"))

    return signatures.select(
        "id",
        F.posexplode(F.array(*[band_bucket(b) for b in range(bands)]))
        .alias("band", "bucket"),
    )


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      verify_threshold: float | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded minhash; optional exact verify.

    Pairs sharing ANY band bucket are candidates (standard banding: a pair
    with Jaccard j collides with prob 1-(1-j^r)^b). The bucket-join is the
    only shuffle; the band id inside the key splits hot content across
    bands."""
    base = docs.select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col), n).alias("sh"),
    )

    def _sig(shv: Column) -> Column:
        return F.array(*[
            F.array_min(F.transform(shv, _minhash_fn(i)))
            for i in range(num_hashes)
        ])

    if verify_threshold is not None:
        # ONE materialization of (id, sh, sz, sig): the shingle arrays
        # feed the signature chain and the pairwise verifier (twice,
        # once per join side), and the signature feeds both sides of the
        # banded self-join — a single checkpoint replaces the former
        # shingle + banded-keys pair of barriers (the band md5 over the
        # stored sig is 4 tiny hashes per row per side, orders of
        # magnitude under the per-shingle chain it re-derived).  At
        # corpus scale the localCheckpoint becomes a durable
        # shingle+signature table — same one-pass property.
        base = base.withColumn("sz", F.size("sh")) \
            .withColumn(
                "sig",
                F.element_at(F.transform(F.array("sh"), _sig), 1)) \
            .localCheckpoint(eager=True)
        sigs = base.select("id", "sig")
        buckets = lsh_buckets(sigs, bands=bands)
    else:
        sigs = base.select(
            "id",
            F.element_at(F.transform(F.array("sh"), _sig), 1).alias("sig"))
        buckets = lsh_buckets(sigs, bands=bands)
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    if verify_threshold is None:
        return cand
    # verify candidates DIRECTLY against the stored shingle sets (the
    # exact formula of jaccard_pairs, applied per candidate pair) instead
    # of computing the full inverted-index all-pairs join and
    # intersecting: identical result set — a candidate pair passes iff
    # its exact Jaccard >= threshold, and threshold > 0 implies any
    # passing pair shares a shingle — at candidate-set cost, not
    # shared-shingle-pair cost.
    x = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                    F.col("sz").alias("sz_a"))
    y = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.col("sz_a") + F.col("sz_b") - inter
    ).cast("double")
    return (
        cand.join(x, "id_a").join(y, "id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text: Column) -> Column:
    """64-bit SimHash over tokens: JVM xxhash64 per token (stays in
    codegen), then an Arrow-batched numpy bit-vote fold.

    Measured at sf0.1: 3.6x faster than the pure-Column formulation
    (`_simhash64_expr`, kept below) — 64 `aggregate()` expressions per row
    blow the whole-stage-codegen budget into interpreted eval, while the
    numpy path moves ~20 int64 per row over Arrow and vectorizes the bit
    unpack.  Both produce bit-identical hashes (test_dedup_recall)."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # coalesce marks the result non-nullable: otherwise join-key null-filter
    # inference inserts an isnotnull(udf) Filter that EVALUATES THE UDF A
    # SECOND TIME per row (verified in the physical plan)
    return F.coalesce(_simhash_votes_udf(hashes), F.lit(0).cast("long"))


def _simhash_votes_udf(hashes: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fold(s: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(s), dtype=np.uint64)
        for i, arr in enumerate(s):
            if arr is None or len(arr) == 0:
                continue
            a = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = (a[:, None] >> shifts) & np.uint64(1)
            votes = bits.sum(0, dtype=np.int64) * 2 - len(a)
            out[i] = ((votes > 0).astype(np.uint64) << shifts).sum(
                dtype=np.uint64
            )
        return pd.Series(out.view(np.int64))

    return fold(hashes)


def _simhash64_expr(text: Column) -> Column:
    """Pure-Column SimHash (no Python at all) — the fallback formulation.

    64 bit-count aggregates per row: correct and shuffle-free, but the
    expression tree exceeds the codegen budget, so it runs interpreted and
    measured ~3.6x slower than `simhash64`.  Kept for environments where
    Python workers are unavailable and as the equality witness in tests."""
    toks = tokens_col(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bits = []
    for bit in range(64):
        votes = F.aggregate(
            hashes, F.lit(0).cast("bigint"),
            _bit_vote_fn(bit),
        )
        bits.append(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("bigint"), bit))
            .otherwise(F.lit(0).cast("bigint"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _bit_vote_fn(bit: int):
    def vote(acc: Column, h: Column) -> Column:
        is_set = F.shiftright(h, bit) % 2 != 0
        return acc + F.when(is_set, F.lit(1)).otherwise(F.lit(-1))

    return vote


def simhash_md5(text: Column, bits: int = 60) -> Column:
    """md5-based SimHash (60-bit) — the DuckDB-reproducible oracle variant.

    Token hash = first 15 hex chars of md5(token) as a 60-bit integer
    (fits signed BIGINT on both engines), then the same Arrow bit-vote
    fold as `simhash64`.  Production uses `simhash64` (JVM xxhash64, no
    string digests); this variant exists so the banded near-dup pipeline
    is value-checkable end-to-end against DuckDB SQL."""
    if bits != 60:
        raise ValueError("md5 variant is fixed at 60 bits (15 hex chars)")
    toks = tokens_col(text)
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    return F.coalesce(_simhash_votes_udf(hashes), F.lit(0).cast("long"))


def simhash_band_stats(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      hash_fn=None, bits: int = 64) -> DataFrame:
    """Bucket-size distribution of the banded simhash index ->
    (band, key, n) ordered by n desc.  Run this BEFORE committing to a
    wide radius on a large corpus: the candidate-verify cost is
    sum(n^2)/2 over buckets, so a handful of mega-buckets means the
    radius/band configuration will not survive scale-up."""
    banded = _simhash_banded(docs, max_hamming, text_col, id_col,
                             hash_fn=hash_fn, bits=bits)
    return (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "band", "key")
    )


def _simhash_banded(docs: DataFrame, max_hamming: int, text_col: str,
                    id_col: str, hash_fn=None, bits: int = 64) -> DataFrame:
    """(id, h, band, key) — shared by the pair join and the stats view."""
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError("max_hamming must be < bits")
    if hash_fn is None:
        hash_fn = simhash64
    # ONE projection computes the simhash, ONE explode emits the band keys
    # (a union of per-band branches would recompute the hash n_bands times —
    # measured as the dominant cost).  No persist: the consumer aggregates
    # this single branch (groupBy collect_list), so the hash UDF runs
    # exactly once per row with no cached state to leak.
    sh = docs.select(F.col(id_col).alias("id"),
                     hash_fn(F.col(text_col)).alias("h"))
    band_keys = []
    for b in range(n_bands):
        start = bits * b // n_bands
        width = bits * (b + 1) // n_bands - start
        if width >= 64:  # single band: the key is the whole hash
            key = F.col("h")
        else:
            key = F.shiftrightunsigned(F.col("h"), start).bitwiseAND(
                F.lit((1 << width) - 1).cast("bigint")
            )
        band_keys.append(
            F.struct(F.lit(b).alias("band"), key.alias("key"))
        )
    return sh.select(
        "id", "h", F.explode(F.array(*band_keys)).alias("bk")
    ).select("id", "h", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      hash_fn=None, bits: int = 64,
                      max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded for scale.

    Band count is derived from the radius: with `bands = max_hamming + 1`
    contiguous bit-chunks, any pair within Hamming <= max_hamming differs in
    at most max_hamming chunks and therefore agrees exactly on at least one
    (pigeonhole) — the candidate join is on (band, chunk-value) keys, never
    all-pairs, and recall at the advertised radius is 100%.

    Scale note: wider radii mean narrower bands (bits // bands), i.e.
    larger buckets and more candidate pairs to verify.  Radii > 7 are
    therefore OPT-IN: they require an explicit ``max_bucket`` cap —
    buckets larger than the cap are dropped from the candidate index
    (bounded recall loss on pathological/boilerplate content, bounded
    O(max_bucket^2) verify cost per bucket — the Manku et al. treatment).
    Measure first with `simhash_band_stats`.

    ``hash_fn``/``bits`` select the hash variant: default `simhash64`
    (xxhash64, production) or `simhash_md5`/60 (DuckDB-oracle-checkable).
    """
    n_bands = max_hamming + 1
    if max_hamming > 7 and max_bucket is None:
        raise ValueError(
            f"max_hamming={max_hamming} > 7 gives {bits // n_bands}-bit band "
            "keys — at corpus scale the buckets go quadratic. Pass an "
            "explicit max_bucket cap (measure with simhash_band_stats) "
            "to opt in to a wide radius."
        )
    banded = _simhash_banded(docs, max_hamming, text_col, id_col,
                             hash_fn=hash_fn, bits=bits)
    # Candidate pairs via groupBy + in-bucket array expansion rather than a
    # banded SELF-JOIN: the hash UDF evaluates once (single branch — AQE
    # would NOT reuse a shuffle stage containing a Python UDF across join
    # sides, which previously forced a session-lifetime persist), the
    # shuffle moves each (id, h) once instead of twice, and the max_bucket
    # guard becomes a free size() filter on the aggregated array.
    # array_sort orders the structs by id, so in-bucket (i < j) expansion
    # yields globally-ordered (id_a < id_b) pairs for the cross-band
    # distinct.  Per-bucket O(n^2) expansion is the inherent verify cost;
    # max_bucket bounds it (see the radius guard above).
    buckets = banded.groupBy("band", "key").agg(
        F.array_sort(F.collect_list(F.struct("id", "h"))).alias("arr")
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("arr") <= max_bucket)
    pairs_sql = (
        "flatten(transform(sequence(1, size(arr) - 1), i -> "
        "transform(slice(arr, i + 1, size(arr) - i), y -> "
        "named_struct('id_a', element_at(arr, i).id, "
        "'h_a', element_at(arr, i).h, 'id_b', y.id, 'h_b', y.h))))"
    )
    cand = (
        buckets.where(F.size("arr") >= 2)
        .select(F.explode(F.expr(pairs_sql)).alias("p"))
        .select("p.id_a", "p.id_b", "p.h_a", "p.h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------
def embedding_near_dups_exact(embeddings: DataFrame, threshold: float = 0.95,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id") -> DataFrame:
    """Pairs with cosine >= threshold — exact all-pairs crossJoin.

    VERIFIER ONLY: O(n^2); use `embedding_near_dups` (LSH-bucketed) as the
    production path and this to measure its recall on samples."""
    from rdf_mapper_spark.ops.similarity import cosine_expr

    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("v_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("v_a"), F.col("v_b"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        n_planes: int = 4, seed: int = 42,
                        dim: int | None = None,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Pairs with cosine >= threshold, LSH-bucketed — the scale path.

    Random-hyperplane buckets (seeded, deterministic) shard the table; the
    self-join is on the bucket key only, then exact cosine verifies within
    buckets. Candidate volume is ~n^2 / 2^n_planes per bucket on uniform
    data; recall per qualifying pair is (1 - theta/pi)^n_planes — tune
    n_planes down (or union several seeded plane sets) for recall, up for
    cost. `embedding_near_dups_exact` is the recall verifier."""
    from rdf_mapper_spark.ops.similarity import (
        dot_expr,
        hyperplanes,
        lsh_bucket_expr,
        norm_expr,
    )

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    # per-vector norm computed once and carried through the join (see
    # semantic_dedup_pairs — cosine_expr would re-fold both norms per
    # candidate pair; identical floats, deterministic expression)
    bucketed = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
        norm_expr(F.col(vec_col)).alias("nrm"),
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        F.col("nrm").alias("nrm_a"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("nrm").alias("nrm_b"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = dot_expr(F.col("v_a"), F.col("v_b")) / (
        F.col("nrm_a") * F.col("nrm_b"))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def contaminated_docs(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Test-set decontamination: -> (doc_id, n_shared_grams) for documents
    sharing at least one word n-gram with a benchmark corpus.

    Contamination is VERBATIM leakage, so the detector is exact n-gram
    overlap (n = 8-13 in production; nothing fuzzy). The benchmark's gram
    set is dictionary-sized — eval sets are tiny next to the training
    corpus — so it broadcasts, and the probe joins inside the exploded
    scan: misses are discarded in the same codegen stage and never reach
    a shuffle (the entity-linking shape). The only shuffle is the final
    per-doc count over hits, which is bounded by benchmark overlap, not
    corpus size.
    """
    from rdf_mapper_spark.ops.text import ngrams_col

    def grams(c: Column) -> Column:
        return F.array_distinct(ngrams_col(tokens_col(c), n))

    bg = benchmark.select(
        F.explode(grams(F.col(text_col))).alias("gram")).distinct()
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams(F.col(text_col))).alias("gram"),
    )
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def winnow_pairs(docs: DataFrame, min_shared: int = 2, k: int = 5,
                 w: int = 4, text_col: str = "text",
                 id_col: str = "doc_id",
                 max_df: int | None = None) -> DataFrame:
    """Passage-level near-dup pairs: -> (id_a, id_b, n_shared) for document
    pairs sharing >= min_shared winnowing fingerprints
    (ops/text.winnow_fingerprints — any common run of >= k+w-1 tokens
    guarantees a shared fp, so this ranks plagiarism/boilerplate pairs).

    Inverted-index self-join on the fingerprint, the jaccard_pairs shape:
    the shuffle key is the fp, so boilerplate shared by many documents is
    the skew risk — ``max_df`` drops fingerprints whose document frequency
    exceeds it BEFORE the self-join (a fp in d docs contributes O(d²)
    pairs; production sets this to a few hundred). None keeps exact
    semantics for oracle checks.
    """
    from rdf_mapper_spark.ops.text import winnow_fingerprints

    fps = docs.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints(F.col(text_col), k, w)).alias("fp"),
    )
    if max_df is not None:
        live = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= max_df).select("fp"))
        fps = fps.join(live, "fp")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp").where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> components -> canonical survivor
# ---------------------------------------------------------------------------
def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, canonical_id, keep): the dedup ACTION a training-data
    pipeline takes after any pair operator (minhash/simhash/jaccard/
    winnow/embedding near-dups).

    Near-duplication is transitive in effect (A~B, B~C => keep one of
    {A,B,C}), so pairs are clustered with connected components
    (pipeline/canonicalize.connected_components: driver union-find below
    the edge threshold, min-label + pointer-jumping loop above it) and the
    survivor is the MINIMUM id per component — deterministic, so re-runs
    keep the same documents.  Docs in no pair keep themselves via the
    left join (the common case: the join adds no shuffle beyond the
    component map, which is bounded by the near-dup rate, not the corpus).

    Downstream: `docs.join(clusters.where("keep"), id_col, "left_semi")`
    — or keep the full map to REDIRECT references onto survivors, the
    same shape entity canonicalization uses for IRIs."""
    from rdf_mapper_spark.pipeline.canonicalize import connected_components

    edges = pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("node").alias(id_col), F.col("comp").alias("__canon"))
    out = docs.select(id_col).join(comp, id_col, "left")
    canonical = F.coalesce(F.col("__canon"), F.col(id_col))
    return out.select(
        F.col(id_col),
        canonical.alias("canonical_id"),
        (canonical == F.col(id_col)).alias("keep"),
    )


def contaminated_docs_bloom(docs: DataFrame, benchmark: DataFrame,
                            n: int = 8, text_col: str = "text",
                            id_col: str = "doc_id",
                            bits_per_gram: int = 16,
                            n_hashes: int = 7) -> DataFrame:
    """`contaminated_docs` with a BLOOM-FILTER prefilter on the exploded
    gram stream — identical output, different scale envelope.

    The exact path broadcast-joins every corpus gram against the
    benchmark gram set; when the benchmark suite grows past comfortable
    broadcast size, the join starts shuffling the full exploded stream.
    Here a bloom bitmap (bits_per_gram per benchmark gram, n_hashes
    probes) filters that stream IN THE SCAN PROJECTION first, so only
    true hits + the ~0.5% false-positive tail reach the verify join.

    Zero false negatives BY CONSTRUCTION, not by numerical luck: the
    bitmap's set positions are computed by Spark itself with the exact
    probe expressions (`pmod(xxhash64(gram, i), m)`), collected, and
    embedded as an array<long> literal — build and probe can never
    disagree on a hash, so the verified output is bit-identical to
    `contaminated_docs` (same DuckDB oracle covers both).  Each probe is
    its own xxhash64(gram, i) — no h1+i*h2 arithmetic that could
    overflow under ANSI mode.

    The bitmap literal is ~2 bytes per benchmark gram (12.5k longs for a
    50k-gram suite); for suites beyond plan-literal comfort, ship it as
    a broadcast variable instead — the probe expression is unchanged.
    """
    from rdf_mapper_spark.ops.text import ngrams_col

    def grams(c: Column) -> Column:
        return F.array_distinct(ngrams_col(tokens_col(c), n))

    bg = benchmark.select(
        F.explode(grams(F.col(text_col))).alias("gram")).distinct()
    n_grams = bg.count()
    m = max(64, ((n_grams * bits_per_gram + 63) // 64) * 64)

    def positions(gram_col: Column) -> list[Column]:
        return [F.pmod(F.xxhash64(gram_col, F.lit(i)), F.lit(m))
                for i in range(n_hashes)]

    pos_rows = bg.select(
        F.explode(F.array(*positions(F.col("gram")))).alias("p")
    ).distinct().collect()
    words = [0] * (m // 64)
    for r in pos_rows:
        p = int(r.p)
        words[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.lit(words)

    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams(F.col(text_col))).alias("gram"),
    )
    hit = None
    for pcol in positions(F.col("gram")):
        word = F.element_at(bitmap, (pcol / 64).cast("int") + 1)
        bit = F.getbit(word, F.pmod(pcol, F.lit(64))) == 1
        hit = bit if hit is None else (hit & bit)
    return (
        dg.where(hit)
        .join(F.broadcast(bg), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def dedup_paragraphs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n") -> DataFrame:
    """Paragraph-granular exact dedup (the RefinedWeb/MassiveText recipe
    done at sub-document level): every paragraph keeps only its FIRST
    occurrence corpus-wide — ordered by (doc id, position) — and each
    document is reassembled from its surviving paragraphs in order.
    -> (doc_id, text); documents whose every paragraph was a repeat
    disappear (their text would be empty).

    Scale shape: one explode, ONE shuffle keyed by md5(paragraph) (the
    window that finds the first occurrence; hashing bounds the shuffle
    key width — full-text keys would move the corpus twice), one
    regroup by doc.  Boilerplate paragraphs (navigation, footers) are
    exactly the hot keys: the window only ranks them, never joins them
    pairwise, so a 10^8-fold repeated footer costs its row count, not
    df^2.  Whitespace-only paragraphs are dropped (they carry no
    content and would conflate under the hash key).
    """
    import re as _re

    from pyspark.sql import Window

    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("pos", "para"),
    ).where(F.trim(F.col("para")) != "")
    w = Window.partitionBy(F.md5("para")).orderBy(
        F.col(id_col).asc(), F.col("pos").asc())
    kept = (paras.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
    return (
        kept.groupBy(id_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"]),
            sep).alias(text_col))
    )


def semantic_dedup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                         cells: list[list[float]] | None = None,
                         n_cells: int = 16, seed: int = 7,
                         dim: int | None = None,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_cell: int | None = None) -> DataFrame:
    """SemDeDup-style candidate pairs: cluster embeddings with a frozen
    coarse codebook, exact cosine WITHIN each cell only.

    (Abbas et al., "SemDeDup", 2023 — public.)  The cluster assignment
    is the same argmax-dot coarse quantizer the IVF index uses
    (similarity.ivf_cell_expr), so a trained `train_centroids` codebook
    drops in unchanged.  Cosine never crosses cells — candidate volume
    is sum(cell_size^2)/2 instead of n^2/2, and the self-join shuffles
    on the cell id only.  Cross-cell near-dups are the recall trade the
    paper makes; tune n_cells down for recall, up for cost.

    `max_cell` is the skew kill-switch (the degenerate-codebook case
    where one cell swallows the corpus): cells above the cap are
    EXCLUDED from pairing — bounded work, explicitly lost recall, same
    policy as winnowing's max_df.
    """
    from rdf_mapper_spark.ops.similarity import (
        centroids,
        dot_expr,
        ivf_cell_expr,
        norm_expr,
    )

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if cells is None:
        cells = centroids(dim, n_cells, seed)
    # norm precomputed ONCE PER VECTOR and carried through the join:
    # cosine_expr per pair would re-run both interpreted 64-element norm
    # folds for every candidate pair (O(pairs) instead of O(vectors) —
    # 2/3 of the per-pair arithmetic); same floats, same rounding, since
    # norm_expr over the same vector is deterministic
    celled = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        ivf_cell_expr(F.col(vec_col), cells).alias("cell"),
        norm_expr(F.col(vec_col)).alias("nrm"),
    )
    if max_cell is not None:
        ok = (celled.groupBy("cell").count()
              .where(F.col("count") <= max_cell).select("cell"))
        celled = celled.join(F.broadcast(ok), "cell")
    a = celled.select(F.col("id").alias("id_a"),
                      F.col("v").alias("v_a"),
                      F.col("nrm").alias("nrm_a"), "cell")
    b = celled.select(F.col("id").alias("id_b"),
                      F.col("v").alias("v_b"),
                      F.col("nrm").alias("nrm_b"), "cell")
    cos = dot_expr(F.col("v_a"), F.col("v_b")) / (
        F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(b, "cell").where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 4))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.95,
                   cells: list[list[float]] | None = None,
                   n_cells: int = 16, seed: int = 7,
                   dim: int | None = None,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   max_cell: int | None = None) -> DataFrame:
    """SemDeDup action: -> (id, canonical_id, keep) — cell-local cosine
    pairs clustered into components (transitive near-dup effect), the
    MINIMUM id survives each component.  Composition of
    `semantic_dedup_pairs` and `dedup_clusters`; share-nothing across
    cells, deterministic across re-runs."""
    pairs = semantic_dedup_pairs(
        embeddings, threshold=threshold, cells=cells, n_cells=n_cells,
        seed=seed, dim=dim, vec_col=vec_col, id_col=id_col,
        max_cell=max_cell)
    ids = embeddings.select(F.col(id_col))
    return dedup_clusters(ids, pairs, id_col=id_col)
