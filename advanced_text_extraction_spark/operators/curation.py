"""Corpus-curation operators for LLM training-data pipelines: repetition
signals, Gopher-style quality gates, benchmark decontamination, PII
redaction, corpus-wide paragraph dedup.

The reference extracts text (`/root/reference/text_extractor.py`); it does
not curate it. These are the standard downstream stages (Gopher §A1 /
C4 / RefinedWeb-style) that a 100 TB extraction output feeds before
training, expressed Spark-first:

- per-document signals (`repetition_stats`, `gopher_quality_flags`,
  `pii_redact`) are pure native column algebra — map-only, zero shuffles,
  inside WholeStageCodegen (array/HOF expressions are interpreted JVM-side
  but never leave the executor);
- corpus-wide decisions shuffle exactly once, partial-agg-friendly:
  `paragraph_dedup` is a hash-keyed groupBy whose map-side combine
  collapses hot boilerplate paragraphs before the exchange (skew-proof by
  construction — no window over a hot key), `decontaminate` broadcasts the
  benchmark n-gram set (eval suites are ~10^5 grams — tiny next to the
  corpus) so the corpus side never shuffles on content.

Every operator is SQL-expressible and oracle-gated (see
``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_count
from .dedup import word_shingles

# Java regex and RE2 (the DuckDB oracle) agree on every construct used
# here: literal classes, \b, \d, \S, bounded quantifiers — and (?m) AFTER
# line terminators are folded to LF (the engines disagree on whether ^/$
# anchor at CRLF/lone-CR/U+2028; gopher_quality_flags folds first). No
# lookbehind anywhere — RE2 does not support it.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d -]{6,}\d"

# Gopher-rule thresholds (Rae et al. 2021, appendix A1.1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _nonblank(parts):
    # blank = no \S anywhere: trim() strips only spaces, so a '\r'
    # remnant line in CRLF text would otherwise count as content and
    # make clean CRLF corpora look artificially repetitive
    return F.filter(parts, lambda x: x.rlike(r"\S"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals (Gopher A1.1 repetition filters):
    duplicate-line fraction, duplicate-line *character* fraction (chars in
    occurrences beyond the first — order-invariant, so list_distinct
    ordering differences between engines can't bite), duplicate-paragraph
    fraction. Lines/paragraphs with no \\S character are excluded.

    Map-only: each document's arrays never leave its row, so this runs at
    scan speed on the full corpus — no explode, no shuffle."""
    # fold line terminators to LF first (like gopher_quality_flags): a
    # CRLF corpus would otherwise never contain a literal "\n\n", so
    # n_paras would read 1 and dup_para_frac 0 for every document — the
    # duplicate-paragraph signal silently dead for such input
    c = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                         "\r\n|[\r\u2028\u2029]", "\n")
    lines = _nonblank(F.split(c, "\n", -1))
    paras = _nonblank(F.split(c, "\n\n", -1))
    dlines = F.array_distinct(lines)
    dparas = F.array_distinct(paras)
    n_lines = F.size(lines)
    n_paras = F.size(paras)
    chars = F.length(F.array_join(lines, ""))
    dchars = F.length(F.array_join(dlines, ""))

    def frac(extra, total):
        return F.round(
            F.when(total > 0, 1 - extra / total.cast("double"))
            .otherwise(F.lit(0.0)), 6)

    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        frac(F.size(dlines), n_lines).alias("dup_line_frac"),
        frac(dchars, chars).alias("dup_char_frac"),
        n_paras.cast("long").alias("n_paras"),
        frac(F.size(dparas), n_paras).alias("dup_para_frac"),
    )


def gopher_quality_flags(df: DataFrame, id_col: str,
                         text_col: str) -> DataFrame:
    """Gopher quality-gate signals + per-rule booleans + the combined keep
    decision (Rae et al. 2021 appendix A1.1): word-count bounds, mean word
    length bounds, symbol-to-word ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, ≥2 distinct common English stopwords.

    All signals are single-pass regexp_count / length expressions — fully
    codegen'd, no explode. Each ratio is rounded to 6dp BEFORE its flag
    comparison so Spark and the SQL oracle take the same branch at
    threshold boundaries. Line terminators are folded to LF FIRST:
    Java regex and RE2 disagree on what (?m)'s ^/$ anchor to (Java: also
    before \\r of CRLF and at lone \\r / U+2028/2029; RE2: '\\n' only),
    so CRLF corpora would otherwise count ellipsis/bullet lines
    differently per engine."""
    cols = gopher_exprs(F.col(text_col))
    return df.select(F.col(id_col),
                     *[v.alias(k) for k, v in cols.items()])


def gopher_exprs(text_col) -> dict:
    """The Gopher signal/flag/keep column expressions over a raw text
    COLUMN — the expression-level surface composite gates build on (see
    ``textstats.quality_exprs``): everything here is row-local, so a
    caller can stack it with other signals in ONE projection / one
    corpus scan. Output order matches ``gopher_quality_flags``."""
    c = F.regexp_replace(F.coalesce(text_col, F.lit("")),
                         "\r\n|[\r\u2028\u2029]", "\n")
    n_words = word_count(c)
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    mean_wl = F.round(nonspace / (n_words + 1e-9), 6)
    sym_ratio = F.round(
        F.regexp_count(c, F.lit(r"#|\.\.\.|…")) / (n_words + 1e-9), 6)
    n_nonblank = F.regexp_count(c, F.lit(r"(?m)^.*\S"))
    bullet_frac = F.round(
        F.regexp_count(c, F.lit(r"(?m)^\s*[-*•]"))
        / (n_nonblank + 1e-9), 6)
    ellipsis_frac = F.round(
        F.regexp_count(c, F.lit(r"(?m)(\.\.\.|…) *$"))
        / (n_nonblank + 1e-9), 6)
    # one match per \S+ token containing a letter (greedy \S* cannot cross
    # whitespace, so matches and tokens are 1:1 in both regex engines)
    alpha_frac = F.round(
        F.regexp_count(c, F.lit(r"\S*[A-Za-z]\S*")) / (n_words + 1e-9), 6)
    low = F.lower(c)
    stop_hits = sum(
        (low.rlike(rf"\b{w}\b").cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0)).cast("long")

    flags = {
        "flag_words": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "flag_mean_word_len": (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN),
        "flag_symbol_ratio": sym_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "flag_bullet": bullet_frac <= GOPHER_MAX_BULLET_FRAC,
        "flag_ellipsis": ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC,
        "flag_alpha_words": alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC,
        "flag_stopwords": stop_hits >= 2,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
        **flags,
        "gopher_keep": keep,
    }


def decontaminate(df: DataFrame, bench: DataFrame, id_col: str,
                  text_col: str, k: int = 3,
                  threshold: float = 0.2) -> DataFrame:
    """Benchmark decontamination: fraction of each training document's
    k-word shingles that appear anywhere in the benchmark/eval corpus
    (the GPT-3/PaLM-style n-gram-overlap test). Docs with fewer than k
    words carry no shingles and emit no row (they cannot be contaminated
    by n-gram evidence).

    Scale shape: ONE Arrow shingling pass over the corpus, ONE broadcast
    hash join (the benchmark shingle set is tiny next to the corpus, so
    the corpus side never shuffles on content), ONE partial-agg-friendly
    groupBy(id) computing the gram total and the hit count TOGETHER —
    count("hit") over the left join makes a separate totals branch (and
    the totals⋈hits join it forces) unnecessary. A two-branch plan also
    re-runs the shingling kernel per branch: Spark does not share
    un-materialized subtrees between a projection and an aggregate."""
    sh = word_shingles(df, id_col, text_col, k)
    bench_set = (word_shingles(bench, id_col, text_col, k)
                 .select("shingle").distinct()
                 .withColumn("hit", F.lit(1)))
    agg = (
        sh.join(F.broadcast(bench_set), "shingle", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
             F.count("hit").cast("long").alias("n_contaminated"))
    )
    contamination = F.round(
        F.col("n_contaminated") / F.col("n_grams").cast("double"), 6)
    return agg.select(
        F.col(id_col), "n_grams", "n_contaminated",
        contamination.alias("contamination"),
        (contamination >= threshold).alias("flagged"),
    )


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrub: replace emails, IPv4 addresses, then +international
    phone numbers with typed placeholder tokens, counting each class.
    Application order is fixed (email → ip → phone, each counting on the
    previous stage's output) so the phone pattern can never consume the
    digits of an already-matched IP — and so the SQL oracle, running the
    same chain, produces byte-identical output.

    Pure regexp_replace/regexp_count chain — codegen'd, map-only."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE)).cast("long")
    t1 = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE)).cast("long")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE)).cast("long")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col), t3.alias("redacted"),
        n_emails.alias("n_emails"), n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


def paragraph_dedup(df: DataFrame, id_col: str, text_col: str,
                    sep: str = "\n\n") -> DataFrame:
    """Corpus-wide exact paragraph dedup (the C4 duplicate-span rule at
    paragraph granularity; pass ``sep="\n"`` for LINE granularity — the
    shape repeated headers/footers/nav crumbs actually take): one row per distinct paragraph hash with its
    occurrence count and the canonical keeper — the lexicographically
    smallest (id, para_idx) occurrence. Consumers anti-join their exploded
    paragraphs against (para_hash, keeper) to drop every later copy.

    Exactly ONE shuffle, keyed by content hash, and it is skew-proof: a
    boilerplate paragraph repeated 10^9 times partial-aggregates to one
    (count, min-struct) row per map partition before the exchange — the
    reason this is a groupBy aggregate and NOT a row_number window, which
    would funnel the hot hash through a single task. The struct-min
    buffer is not UnsafeRow-mutable, so Spark plans a SortAggregate (a
    string-packed key hits the same limit — string buffers aren't
    hash-aggregable either); the partial/final split and the map-side
    combine are unchanged, the cost is a per-map-partition sort of the
    exploded paragraphs. If that sort ever dominates, the alternative is
    two HASH aggregates — groupBy(hash, id).agg(min(idx)) then
    groupBy(hash).agg(min(id), min_by(idx, id)) — trading the sort for a
    second slim exchange."""
    import re

    # same LF fold as repetition_stats: paragraph boundaries in a CRLF
    # corpus are "\r\n\r\n", which a literal "\n\n" split never sees
    c = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")),
                         "\r\n|[\r\u2028\u2029]", "\n")
    # keep only paragraphs with a \S char: an odd run of 3+ newlines (or
    # CRLF blank spans) otherwise emits a whitespace-only "paragraph"
    # whose shared hash accumulates a huge phantom n_copies corpus-wide
    # F.split takes a Java regex \u2014 quote the separator so a caller
    # passing '|' or '.' splits on the LITERAL character, not
    # between-every-character (ADVICE r3; re.escape only backslashes
    # non-alphanumerics, which Java regex reads as the literal char)
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(c, re.escape(sep), -1)).alias(
            "para_idx", "para"),
    ).where(F.col("para").rlike(r"\S"))
    agg = paras.groupBy(F.md5(F.col("para")).alias("para_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.struct(F.col(id_col), F.col("para_idx"))).alias("keeper"),
    )
    return agg.select(
        "para_hash", "n_copies",
        F.col(f"keeper.{id_col}").alias("keeper_id"),
        F.col("keeper.para_idx").cast("int").alias("keeper_idx"),
    )


def curation_policy(df: DataFrame, id_col: str, text_col: str,
                    min_quality: float = 0.3,
                    min_logprob: float = -4.0,
                    fused: bool = True) -> DataFrame:
    """One keep/drop decision per document composing the three quality
    tiers this module family provides — the shape of a production
    curation gate (RefinedWeb/Gopher-style pipelines stack rule gates,
    a quality score, and an LM proxy):

    - Gopher rule gates (``gopher_quality_flags.gopher_keep``),
    - the [0,1] heuristic ``quality_score`` ≥ ``min_quality``,
    - the corpus-fit unigram LM proxy ``mean_logprob`` ≥ ``min_logprob``
      (docs with no tokens have no LM row and FAIL this gate — empty
      docs are never keepable).

    ``reasons`` lists the failed gates comma-joined in a fixed order
    (gopher,quality,lm) so the value is deterministic and the DuckDB
    oracle (which composes the three sub-oracles verbatim) hashes
    identically.

    Scale shape (``fused=True``, the default — VERDICT r3 #2): gopher
    keep and quality score are BOTH row-local, so they are computed in
    ONE projection over one corpus scan; only the LM tier — intrinsically
    corpus-wide (vocab fit) — is a separate branch, joined back doc-keyed
    (already partitioned by its own final aggregation). ``fused=False``
    keeps the three-way composition of the standalone operators (each
    independently oracle-gated) — the test surface that pins
    fused ≡ composed. All joins are id-equi-joins, no new shuffle
    classes; fusing removes one full corpus scan AND the gopher⋈quality
    equi-join (the LM branch keeps its own documented scan shape)."""
    from .sampling import unigram_logprob
    from .textstats import quality_exprs, quality_score

    if fused:
        g = df.select(
            F.col(id_col),
            gopher_exprs(F.col(text_col))["gopher_keep"]
            .alias("gopher_keep"),
            quality_exprs(F.col(text_col))["quality"].alias("quality"),
        )
    else:
        g = gopher_quality_flags(df, id_col, text_col) \
            .select(id_col, "gopher_keep") \
            .join(quality_score(df, id_col, text_col)
                  .select(id_col, "quality"), id_col)
    u = unigram_logprob(df, id_col, text_col) \
        .select(id_col, "mean_logprob")
    j = g.join(u, id_col, "left")
    pass_q = F.col("quality") >= F.lit(min_quality)
    pass_lm = F.coalesce(
        F.col("mean_logprob") >= F.lit(min_logprob), F.lit(False))
    keep = F.col("gopher_keep") & pass_q & pass_lm
    reasons = F.concat_ws(
        ",",
        F.when(~F.col("gopher_keep"), F.lit("gopher")),
        F.when(~pass_q, F.lit("quality")),
        F.when(~pass_lm, F.lit("lm")))
    return j.select(F.col(id_col), keep.alias("keep"),
                    reasons.alias("reasons"))
