"""Text analysis operators: language-ID (stopword vote + char-trigram
n-gram heuristic), quality scoring (length/alpha/word-length bands +
stopword/punct ratios), token counting (whitespace + BPE-ish pre-tokenizer
regex), document fingerprinting (md5 + winnowing rolling min-hash).

Pure Column expressions, zero Python on the executors.  The higher-order
functions (transform/filter/aggregate) evaluate OUTSIDE whole-stage
codegen — Spark interprets HOF expression trees — but stay entirely
JVM-side with no row materialization to Python, which is the property
that matters at 100 TB (verified: no *EvalPython nodes in the plans,
tests/test_plan_shape.py).

Scope note: the tokenizer splits on non-letter/digit runs, so every
token-based signal here (stopword ratios, quality bands, n-grams,
winnowing) assumes whitespace-delimited scripts.  CJK text (the `zh`
label in the fixtures) needs a segmenter before these operators apply —
`char_trigrams`/`lang_id_ngram` are the only signals that work
unsegmented.  Routing unknown languages to the `en` stopword list is a
deliberate conservative default; a production deployment extends
STOPWORDS/TRIGRAMS per supported language."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "les"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu", "den", "von"],
}


def tokens_col(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def ngrams_col(tokens: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams in O(len) via sliding zip_with (NOT per-position slices,
    which would be O(len^2) per row — measurable at web scale)."""
    if n == 1:
        return tokens
    grams = tokens
    for k in range(1, n):
        shifted = F.slice(
            tokens, k + 1, F.greatest(F.size(tokens) - k, F.lit(0))
        )
        grams = F.zip_with(
            grams, shifted,
            lambda a, b: F.concat(a, F.lit(sep), b),
        )
    # zip_with pads the shorter side with null -> drop the null tail
    return F.filter(grams, lambda g: g.isNotNull())


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    hits = F.size(F.filter(
        toks, lambda t: t.isin(STOPWORDS.get(lang, STOPWORDS["en"]))
    ))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks).cast("double")) \
        .otherwise(F.lit(0.0))


def _isin_fn(words: list[str]):
    return lambda t: t.isin(words)


def _vote_argmax(votes: dict[str, Column]) -> Column:
    """Deterministic argmax over per-language vote columns ('und' on 0)."""
    best = None
    best_count = None
    for lang, cnt in votes.items():
        if best is None:
            best, best_count = F.lit(lang), cnt
        else:
            cond = cnt > best_count
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_count = F.when(cond, cnt).otherwise(best_count)
    return F.when(best_count > 0, best).otherwise(F.lit("und"))


def lang_id(text: Column) -> Column:
    """Stopword-vote language guess; 'und' when nothing matches."""
    toks = tokens_col(text)
    votes = {
        lang: F.size(F.filter(toks, _isin_fn(list(ws))))
        for lang, ws in STOPWORDS.items()
    }
    return _vote_argmax(votes)


#: tiny per-language character-trigram profiles for the n-gram heuristic
TRIGRAMS = {
    "en": ["the", "and", "ing", "ion", "ent", "tio", "for", "hat"],
    "fr": ["les", "ent", "que", "des", "une", "ait", "eur", "oir"],
    "de": ["der", "die", "und", "ein", "sch", "ich", "den", "ung"],
}


def char_trigrams(text: Column) -> Column:
    """All overlapping 3-char windows of the lowercased text — O(len),
    pure Columns (sequence + substr inside whole-stage codegen)."""
    t = F.lower(text)
    n = F.length(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - 2), lambda i: t.substr(i, F.lit(3))
    )
    return F.when(n >= 3, grams).otherwise(F.array().cast("array<string>"))


def lang_id_ngram(text: Column) -> Column:
    """Character-n-gram language vote: count profile-trigram hits per
    language, argmax (the classical n-gram LID heuristic, complementing
    the token-level stopword vote in `lang_id`)."""
    grams = char_trigrams(text)
    votes = {
        lang: F.size(F.filter(grams, _isin_fn(list(tg))))
        for lang, tg in TRIGRAMS.items()
    }
    return _vote_argmax(votes)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither letter/digit/whitespace."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")) \
        .otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length band + alpha ratio + mean word len.

    The exact formula is arbitrary (as in any web-text pipeline); what
    matters is that it is deterministic, cheap, and fully JVM-side.
    """
    n = F.length(text)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")) \
        .otherwise(F.lit(0.0))
    mean_wl = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    len_band = F.when((n_tok >= 20) & (n_tok <= 100000), F.lit(1.0)) \
        .when(n_tok >= 5, F.lit(0.5)).otherwise(F.lit(0.0))
    wl_band = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)) \
        .otherwise(F.lit(0.3))
    return F.round((len_band + alpha_ratio + wl_band) / F.lit(3.0), 4)


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased token join.

    md5 is bit-identical across Spark and DuckDB, which makes the operator
    oracle-checkable end-to-end."""
    return F.md5(F.array_join(tokens_col(text), " "))


#: GPT-2-style pre-tokenizer pieces (contractions, letter runs, digit runs,
#: punctuation runs — each with its optional leading space).  Deliberately
#: lookaround-free so the SAME pattern runs in Java regex (Spark, codegen)
#: and RE2 (DuckDB oracle) with identical matches.
BPE_SPLIT_RX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_estimate(text: Column) -> Column:
    """LLM-token-cost estimate: count of BPE pre-tokenizer pieces.

    Every true BPE token boundary falls on a pre-token boundary, so this
    lower-bounds and strongly correlates with real tokenizer counts
    without shipping a merges table to executors.  Pure JVM regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RX), F.lit(0)))


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al., MOSS): the min hash of
    every w-window over the rolling k-token shingle hashes; distinct mins
    are the document's fingerprints -> array<bigint>.

    Guarantees of the scheme: any shared run of >= k+w-1 tokens between two
    documents yields at least one shared fingerprint, and per-doc output is
    ~n/w values.  O(len) per row, pure Column expressions (whole-stage
    codegen); hashes are md5/60-bit so the operator is value-checkable in
    DuckDB."""
    grams = ngrams_col(tokens_col(text), k)
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )

    # let-binding via a 1-element array wrap: every use of `h` below is a
    # bound lambda variable, so the md5 chain evaluates ONCE per row.
    # Referencing `hashes` directly in the per-window lambda would inline
    # the whole transform into each window position (HOFs are interpreted,
    # no common-subexpression elimination) — O(n^2) md5 calls per document,
    # measured 3x slower on the sf0.1 bench.
    def _mins(h: Column) -> Column:
        n = F.size(h)
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
        mins = F.transform(idx, lambda i: F.array_min(F.slice(h, i, w)))
        return F.when(n > 0, F.array_distinct(mins)) \
            .otherwise(F.array().cast("array<bigint>"))

    return F.element_at(F.transform(F.array(hashes), _mins), 1)


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_token_estimate(t).alias("n_tokens_bpe"),
        lang_id(t).alias("lang_guess"),
        lang_id_ngram(t).alias("lang_guess_ngram"),
        quality_score(t).alias("quality"),
        F.round(stopword_ratio(t, "en"), 4).alias("stopword_ratio_en"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        fingerprint(t).alias("fp"),
    )


# Gopher-style corpus filter rule set: (label, threshold) pairs documented
# here because the DuckDB oracle mirrors them independently.  Labels are
# emitted in ALPHABETICAL order so the joined reason string is canonical:
#   high_punct    punct_ratio > 0.10
#   low_alpha     alpha chars / chars < 0.80
#   low_stopword  en-stopword ratio < 0.03 (gibberish / non-language signal)
#   too_long      n_tokens > 100_000
#   too_short     n_tokens < 20
#   word_len      mean word length outside [3, 12]
def stopword_ratio_routed(text: Column, lang_col: Column) -> Column:
    """Stopword ratio against the ROW's language's list (known: en/fr/de;
    anything else falls back to en — a missing list must not flag every
    document of that language as gibberish).  CASE branches evaluate
    lazily, so exactly one language's filter runs per row."""
    out = F.when(lang_col == "fr", stopword_ratio(text, "fr")) \
        .when(lang_col == "de", stopword_ratio(text, "de"))
    return out.otherwise(stopword_ratio(text, "en"))


def quality_reasons(text: Column, lang: str = "en",
                    lang_col: Column | None = None) -> Column:
    """Comma-joined sorted drop-reason labels; empty string = keep.

    With ``lang_col`` the low_stopword rule routes per row via
    `stopword_ratio_routed`; otherwise the static ``lang`` list applies.
    concat_ws skips null fragments, so each rule contributes its label or
    null — the whole verdict is one codegen'd projection, no shuffle.

    NULL or empty text (a failed extraction) short-circuits to the single
    reason ``null_text``: without the guard every rule condition is NULL,
    concat_ws skips them all, and the degenerate row silently KEEPS — and
    the per-engine arithmetic on zero-length text (0/0, NULL means)
    diverges between Spark and any SQL oracle.  One explicit label is
    deterministic on both.

    The whole verdict is ONE ``aggregate`` over the token array whose
    ``finish`` lambda renders the final string: every expensive subtree
    (the token split, each ratio regex) occurs exactly once in the
    expression tree, so the verdict survives filter pushdown / projection
    collapse without re-evaluating the split per rule — higher-order
    functions are CodegenFallback, where Catalyst's subexpression
    elimination does not reach (measured 1.7x on the curation path;
    values byte-identical, pinned by the ops tests + curation oracles)."""
    toks = tokens_col(text)
    n = F.length(text)
    zero = F.struct(F.lit(0).cast("bigint").alias("cnt"),
                    F.lit(0).cast("bigint").alias("tot"),
                    F.lit(0).cast("bigint").alias("hits"))
    if lang_col is not None:
        def _is_stop(x: Column) -> Column:
            # same routing as stopword_ratio_routed: fr/de routed, every
            # other language scored against the English list
            return (F.when(lang_col == "fr", x.isin(STOPWORDS["fr"]))
                    .when(lang_col == "de", x.isin(STOPWORDS["de"]))
                    .otherwise(x.isin(STOPWORDS["en"])))
    else:
        _words = STOPWORDS.get(lang, STOPWORDS["en"])

        def _is_stop(x: Column) -> Column:
            return x.isin(_words)

    def merge(acc: Column, x: Column) -> Column:
        return F.struct(
            (acc["cnt"] + 1).alias("cnt"),
            (acc["tot"] + F.length(x)).alias("tot"),
            (acc["hits"] + F.when(_is_stop(x), 1).otherwise(0)
             .cast("bigint")).alias("hits"),
        )

    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))

    def rule(cond: Column, label: str) -> Column:
        return F.when(cond, F.lit(label))

    def finish(acc: Column) -> Column:
        n_tok = acc["cnt"]
        dt = n_tok.cast("double")
        nn = n.cast("double")
        alpha_ratio = F.when(n > 0, alpha.cast("double") / nn) \
            .otherwise(F.lit(0.0))
        pr = F.when(n > 0, punct.cast("double") / nn).otherwise(F.lit(0.0))
        swr = F.when(n_tok > 0, acc["hits"].cast("double") / dt) \
            .otherwise(F.lit(0.0))
        mean_wl = F.when(n_tok > 0, acc["tot"].cast("double") / dt) \
            .otherwise(F.lit(0.0))
        return F.concat_ws(
            ",",
            rule(pr > 0.10, "high_punct"),
            rule(alpha_ratio < 0.80, "low_alpha"),
            rule(swr < 0.03, "low_stopword"),
            rule(n_tok > 100_000, "too_long"),
            rule(n_tok < 20, "too_short"),
            rule((mean_wl < 3.0) | (mean_wl > 12.0), "word_len"),
        )

    verdict = F.aggregate(toks, zero, merge, finish)
    return F.when(text.isNull() | (F.length(text) == 0),
                  F.lit("null_text")).otherwise(verdict)


def filter_documents(docs: DataFrame, text_col: str = "text",
                     lang: str = "en",
                     lang_col: str | None = None) -> DataFrame:
    """-> (doc_id, keep: boolean, reasons: string).  The corpus-filter
    stage of a training-data pipeline; downstream consumers `WHERE keep`
    (predicate pushes into the scan) and auditors group by reasons.
    ``lang_col`` routes the stopword rule per row by that language
    column."""
    reasons = quality_reasons(
        F.col(text_col), lang,
        lang_col=F.col(lang_col) if lang_col is not None else None)
    return docs.select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
# Patterns are deliberately RE2-compatible (no lookarounds, no backrefs):
# they run identically under Java regex (Spark), RE2 (DuckDB oracles) and
# production regex services.  Conservative by design — the phone pattern
# requires punctuation-joined digit runs rather than matching any long
# number, trading recall for a near-zero false-positive rate on prices,
# years and ids (the standard web-pipeline trade; cf. the public C4/CCNet
# cleanup recipes).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9().-]{6,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}
# redaction order matters: emails first (their local/domain parts contain
# digit runs the phone/ip patterns could shred), then structured ids
PII_ORDER = ("email", "ssn", "ipv4", "phone")


def redact_pii(text: Column, kinds: tuple[str, ...] = PII_ORDER) -> Column:
    """Replace each PII match with ``<KIND>`` — one codegen'd
    regexp_replace chain, zero Python, zero shuffle."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind],
                               f"<{kind.upper()}>")
    return out


def pii_counts(text: Column, kinds: tuple[str, ...] = PII_ORDER) -> Column:
    """struct of per-kind match counts (audit/metrics side of the scrub).

    Counts are taken on the PROGRESSIVELY REDACTED text in the same order
    `redact_pii` applies, so a token is attributed to exactly one kind
    (an email's digits never also count as a phone)."""
    fields = []
    cur = text
    for kind in kinds:
        fields.append(
            F.coalesce(F.regexp_count(cur, F.lit(PII_PATTERNS[kind])),
                       F.lit(0)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, PII_PATTERNS[kind],
                               f"<{kind.upper()}>")
    return F.struct(*fields)


def scrub_documents(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, clean_text, n_email, n_ssn, n_ipv4, n_phone) — the
    PII-scrub stage of a training-data pipeline.  Map-only; at corpus
    scale the scan absorbs it entirely."""
    counts = pii_counts(F.col(text_col))
    return docs.withColumn("__c", counts).select(
        F.col(id_col),
        redact_pii(F.col(text_col)).alias("clean_text"),
        *[F.col("__c")[f"n_{k}"].alias(f"n_{k}") for k in PII_ORDER],
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style repetition rules)
# ---------------------------------------------------------------------------
def repetition_metrics(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       ngram_sizes: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition-rule
    family): -> (doc_id, dup_line_frac, dup_line_char_frac,
    top_{n}gram_char_frac ...).

      * dup_line_frac — fraction of lines that are repeats of an earlier
        line ((total - distinct) / total);
      * dup_line_char_frac — fraction of line characters living in lines
        that occur more than once;
      * top_{n}gram_char_frac — characters covered by the single most
        frequent word n-gram (count * len(gram)) over the document's
        total characters; ties broken by gram ascending so the metric is
        deterministic.

    Shape: explode + two-level aggregation per signal, keyed by
    (doc_id, line|gram) — uniform keys with map-side partial aggregation,
    the well-behaved shuffle.  A pure-HOF per-row formulation would save
    the shuffle but pays O(n log n) interpreted sorts per row and cannot
    share codegen; at corpus scale the keyed aggregate is the plan that
    survives (same shape the public Gopher/RefinedWeb pipelines use).
    Thresholding is the caller's policy (e.g. drop at dup_line_frac >
    0.30, top_2gram_char_frac > 0.20)."""
    from pyspark.sql import Window

    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    total = base.select("id", F.length("t").alias("n_chars"))

    lines = base.select(
        "id",
        F.explode(F.filter(F.split("t", "\n"), lambda x: x != ""))
        .alias("line"),
    )
    per_line = lines.groupBy("id", "line").agg(F.count("*").alias("c"))
    line_stats = per_line.groupBy("id").agg(
        ((F.sum("c") - F.count("*")) / F.sum("c")).alias("dup_line_frac"),
        (F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("line"))
               .otherwise(F.lit(0)))
         / F.sum(F.col("c") * F.length("line"))).alias("dup_line_char_frac"),
    )

    out = total.join(line_stats, "id", "left")
    # tokenize ONCE for every n-gram size: each gram branch previously
    # re-ran the full tokenizer over the corpus (profiled as one
    # identical stage per n).  The checkpoint holds (id, toks) — the
    # durable-intermediate the pipeline's checkpoint stage provides at
    # corpus scale — computed fresh per invocation.
    toked = None
    if ngram_sizes:
        toked = base.select(
            "id", tokens_col(F.col("t")).alias("toks")
        ).localCheckpoint(eager=True)
    for n in ngram_sizes:
        grams = toked.select(
            "id", F.explode(ngrams_col(F.col("toks"), n)).alias("gram"),
        )
        per_gram = grams.groupBy("id", "gram").agg(F.count("*").alias("c"))
        w = Window.partitionBy("id").orderBy(
            F.col("c").desc(), F.col("gram").asc())
        top = (per_gram.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") == 1)
               .select("id", (F.col("c") * F.length("gram"))
                       .alias(f"__top{n}")))
        out = out.join(top, "id", "left")
    sel = [
        F.col("id").alias(id_col),
        F.round(F.coalesce("dup_line_frac", F.lit(0.0)), 4)
        .alias("dup_line_frac"),
        F.round(F.coalesce("dup_line_char_frac", F.lit(0.0)), 4)
        .alias("dup_line_char_frac"),
    ]
    for n in ngram_sizes:
        sel.append(
            F.round(
                F.when(F.col("n_chars") > 0,
                       F.coalesce(F.col(f"__top{n}"), F.lit(0))
                       .cast("double") / F.col("n_chars"))
                .otherwise(F.lit(0.0)), 4).alias(f"top_{n}gram_char_frac"))
    return out.select(*sel)


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------
def tfidf_top_terms(docs: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_df_frac: float | None = 0.5) -> DataFrame:
    """-> (doc_id, rank, term, score): each document's k most
    characteristic terms by tf-idf (idf = ln(n_docs / df)).

    ``max_df_frac`` is the skew kill-switch AND a quality filter in one:
    terms in more than that fraction of documents are dropped BEFORE the
    df join — they are the hot join keys ('the' appears in every doc, so
    its (term)-keyed rows all land on one reducer) and their idf is near
    zero anyway, so they could never be a top term.  None keeps exact
    semantics.

    Ranking is on the ROUNDED score (4 dp) with term-ascending
    tie-break, so the output is deterministic and engine-portable (an
    unrounded float rank would flap across summation orders)."""
    from pyspark.sql import Window

    n_docs = docs.count()
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokens_col(F.col(text_col))).alias("t"))
    # materialize tf once: it feeds BOTH the df aggregation and the tf
    # side of the score join, and nothing reuses the exchange (different
    # keys), so without this the tokenize+explode+count subtree — the
    # expensive part at corpus scale — executes twice (profiled as two
    # identical stages).  The checkpoint is (doc, term)-sized, computed
    # fresh per invocation.
    tf = toks.groupBy("id", "t").agg(F.count("*").alias("tf")) \
        .localCheckpoint(eager=True)
    df_t = tf.groupBy("t").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        df_t = df_t.where(F.col("df") <= int(max_df_frac * n_docs))
    scored = tf.join(df_t, "t").select(
        "id", F.col("t").alias("term"),
        F.round(F.col("tf") * F.ln(F.lit(float(n_docs)) / F.col("df")), 4)
        .alias("score"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("id").alias(id_col), "rank", "term", "score"))


def corpus_stats(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 lang_col: str | None = "lang") -> DataFrame:
    """ONE-row corpus summary (the dashboard/alerting aggregate):
    doc count, token totals, quality keep-rate, exact-dup rate, and
    per-language counts as scalar columns.

    Single groupBy().agg() — every aggregate is associative, so the whole
    thing is map-side partials plus one tiny final reduce; the exact-dup
    rate rides the same pass via count(distinct md5(text))."""
    lc = F.col(lang_col) if lang_col is not None else None
    keep = (quality_reasons(F.col(text_col), lang_col=lc) == "") \
        .cast("int")
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("bigint")
        .alias("total_tokens"),
        F.round(F.avg(keep), 4).alias("keep_rate"),
        F.round(1 - F.count_distinct(F.md5(F.col(text_col)))
                / F.count("*"), 4).alias("dup_rate"),
    ]
    if lang_col is not None:
        known = ("en", "fr", "de", "es", "zh")
        for lg in known:
            aggs.append(F.sum((F.col(lang_col) == lg).cast("int"))
                        .cast("bigint").alias(f"n_{lg}"))
        aggs.append(F.sum((~F.col(lang_col).isin(*known))
                          .cast("int")).cast("bigint").alias("n_other"))
    return docs.agg(*aggs)


# ---------------------------------------------------------------------------
# Token-window chunking (context-window packing prep)
# ---------------------------------------------------------------------------
def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into fixed-token windows with overlap ->
    (doc_id, chunk_id, n_tok, chunk_text): the preprocessing step that
    feeds sequence packing for training.

    Stride = chunk_tokens - overlap; the last window is the remainder
    (never empty, never duplicated: a doc shorter than one chunk yields
    exactly one chunk).  Pure Column expressions — token array built
    once, windows via sequence+slice, one explode; the scan absorbs it,
    no shuffle.  Chunk text re-joins tokens with single spaces, i.e.
    chunking is defined over the TOKEN stream (what the trainer sees),
    not raw bytes."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(
            F.lit(1),
            (F.greatest(F.size(toks) - F.lit(overlap), F.lit(1))
             + F.lit(stride) - 1) / F.lit(stride),
        ).cast("int"),
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            (i - 1).alias("chunk_id"),
            F.slice(toks, (i - 1) * stride + 1, chunk_tokens).alias("w"),
        ),
    )
    # let-binding: bind the token array once (interpreted HOFs get no CSE)
    bound = F.element_at(
        F.transform(F.array(toks), lambda _: chunks), 1)
    return (
        docs.select(F.col(id_col), F.explode(bound).alias("ch"))
        .select(
            F.col(id_col),
            F.col("ch.chunk_id").alias("chunk_id"),
            F.size("ch.w").alias("n_tok"),
            F.array_join("ch.w", " ").alias("chunk_text"),
        )
        .where(F.col("n_tok") > 0)
    )


def pack_sequences(docs: DataFrame, budget_tokens: int = 2048,
                   group_size: int = 1024, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign documents to fixed-token-budget training sequences ->
    (doc_id, grp, pack_id, n_tok, start_tok): the packing step between
    chunking and batch assembly.

    Packing is done WITHIN deterministic co-packing groups
    (grp = doc_id // group_size) ordered by doc id: the running token
    count over the group, divided by the budget, is the pack index, and
    `start_tok` is the document's offset into its group's token stream.
    A document longer than the budget still gets one pack (the trainer
    splits it downstream — chunk first if that matters).

    The grouping is the scale decision: a GLOBAL ordered cumulative sum
    is a single-task window (the exact plan shape the unigram-vocab fix
    removed), while per-group windows partition by grp and parallelize
    — the only cross-group effect is that the last pack of each group
    may run short, a fragmentation cost of at most one budget per
    group, negligible at group_size >> budget/avg_doc_tokens.  Pure
    window aggregation, ONE shuffle keyed by grp."""
    from pyspark.sql import Window

    n_tok = token_count(F.col(text_col))
    grp = (F.col(id_col) / F.lit(group_size)).cast("long")
    w = (Window.partitionBy("grp").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    base = docs.select(F.col(id_col), grp.alias("grp"),
                       n_tok.alias("n_tok"))
    return base.select(
        id_col, "grp", "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start_tok"),
    ).select(
        id_col, "grp",
        (F.col("start_tok") / F.lit(budget_tokens)).cast("long")
        .alias("pack_id"),
        "n_tok", "start_tok",
    )
