"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's file-list dedupe (SURVEY §2.7 U1,
/root/reference/cli.py:430) — these are the corpus-level near-dup tools a
100 TB text pipeline needs. Everything is built-in column algebra (md5,
split, explode, sequence, window): zero Python UDFs, so the whole chain
stays in WholeStageCodegen and scales with the shuffle, not the
interpreter. Hashes are md5-hex (lexicographic min == numeric min on the
uniform hash), portable bit-for-bit to the DuckDB oracle.

Scale notes:
- minhash explodes ×(shingles × n_perms): the standard LSH cost. At
  10^12 docs you run it banded (lsh_candidate_pairs) so the only
  pairwise work is within tiny band buckets — never all-pairs.
- All joins key on content hashes (uniformly distributed) — no skew by
  construction; exact-dup groups on md5(text) are bounded by true dup
  cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content hash (reference md5 file-hash analog,
    /root/reference/text_extractor.py:1002-1008): one row per duplicated
    content value — keeper = min id, n_copies > 1."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc — the unit for minhash/jaccard."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.when(
        F.size(words) >= k, F.sequence(F.lit(1), F.size(words) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def _shingle_array(text_col, k: int = 3):
    """Per-row array of k-word shingles (same set word_shingles explodes)."""
    words = F.split(F.trim(text_col), r"\s+")
    idx = F.when(
        F.size(words) >= k, F.sequence(F.lit(1), F.size(words) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))


def minhash_signature_array(df: DataFrame, id_col: str, text_col: str,
                            n_perms: int = 12, k: int = 3) -> DataFrame:
    """MinHash signature as ONE narrow projection — no explode, no shuffle.

    perm p's hash of shingle s = md5('<p>:'||s); sig[p] = min over the
    doc's shingles. min over the multiset equals min over the distinct
    set, so no dedup pass is needed. At 10^12 docs this is the shape that
    matters: signature building is embarrassingly parallel map work; only
    the LSH bucket join below ever shuffles."""
    sh = _shingle_array(F.col(text_col), k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_perms - 1)),
        lambda p: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat_ws(":", p, s)))),
    )
    return df.select(F.col(id_col), sig.alias("sig"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_perms: int = 12) -> DataFrame:
    """Row view (id, perm, minhash) of the narrow signature array (the
    driver-oracle-comparable shape). Docs with no shingles emit no rows
    (array_min of an empty set is null → filtered), matching the
    explode-based formulation."""
    arr = minhash_signature_array(df, id_col, text_col, n_perms)
    return (
        arr.select(id_col, F.posexplode("sig").alias("perm", "minhash"))
        .filter(F.col("minhash").isNotNull())
        .withColumn("perm", F.col("perm").cast("long"))
    )


def lsh_band_keys(df: DataFrame, id_col: str, text_col: str,
                  n_perms: int = 12, rows_per_band: int = 3) -> DataFrame:
    """(id, band, band_key) rows; band key = md5 of the band's minhashes
    in perm order — computed narrow from the signature array."""
    n_bands = n_perms // rows_per_band
    arr = minhash_signature_array(df, id_col, text_col, n_perms)
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.concat_ws(
            ",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))),
    )
    return (
        arr.filter(F.element_at("sig", 1).isNotNull())
        .select(id_col, F.posexplode(bands).alias("band", "band_key"))
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_perms: int = 12, rows_per_band: int = 3) -> DataFrame:
    """LSH near-dup candidates: docs sharing any band key. The bucket
    self-join is the ONLY shuffle in the whole minhash→LSH chain; at
    corpus scale buckets are tiny, so the shuffle is the only O(n) cost."""
    keys = lsh_band_keys(df, id_col, text_col, n_perms, rows_per_band)
    a = keys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = keys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(shingles: DataFrame, id_col: str,
                        threshold: float = 0.5) -> DataFrame:
    """Exact shingle-set Jaccard over pairs sharing ≥1 shingle.
    At scale this runs AFTER lsh_candidate_pairs (verify step); standalone
    it is the n-gram-Jaccard dedup baseline."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over word occurrences. Per token, bit j comes from
    md5 nibble j//4 (bit j%4); doc bit j = sign of Σ(±1).

    Computed as ONE narrow projection per row (token array → md5 array →
    32 per-bit reductions) — no explode, no shuffle. The previous
    formulation exploded to |tokens|×32 rows and shuffled twice; at
    10^12 docs that shuffle dominates, while this shape is pure map work
    that scales with the scan."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
    hashes = F.transform(
        F.filter(words, lambda t: t != ""), lambda t: F.md5(t))
    # materialize the md5 array once per row; the 32 per-bit reductions
    # below all re-read this column instead of re-hashing the tokens
    hashed = df.select(F.col(id_col), hashes.alias("_hs"))

    # nibble value via conv(hex digit) — equals the oracle's
    # strpos('0123456789abcdef', digit) - 1 on lowercase md5 hex
    def _bit_merge(nib: int, bit: int):
        def merge(acc, h):
            return acc + (
                F.conv(F.substring(h, nib + 1, 1), 16, 10).cast("int")
                .bitwiseAND(F.lit(1 << bit)) / F.lit(1 << bit)
            ).cast("int") * 2 - 1
        return merge

    simhash = F.lit(0).cast("long")
    for j in range(32):
        s_j = F.aggregate(F.col("_hs"), F.lit(0), _bit_merge(j // 4, j % 4))
        simhash = simhash + F.when(
            s_j > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return hashed.select(id_col, simhash.alias("simhash"))
