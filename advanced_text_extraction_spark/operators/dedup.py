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


def minhash_signatures(shingles: DataFrame, id_col: str,
                       n_perms: int = 12) -> DataFrame:
    """MinHash: perm p's hash of shingle s = md5('<p>:'||s); signature =
    min per (doc, p). Output rows (id, perm, minhash)."""
    perms = F.sequence(F.lit(0), F.lit(n_perms - 1))
    hashed = shingles.select(
        id_col,
        F.explode(perms).alias("perm"),
        F.col("shingle"),
    ).withColumn(
        "h", F.md5(F.concat_ws(":", F.col("perm"), F.col("shingle")))
    )
    return (
        hashed.groupBy(id_col, "perm")
        .agg(F.min("h").alias("minhash"))
        .withColumn("perm", F.col("perm").cast("long"))
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        rows_per_band: int = 3) -> DataFrame:
    """Band the signature (LSH): band key = md5 of the band's minhashes in
    perm order; docs sharing any band key become candidate pairs.
    The self-join is per band-bucket — at corpus scale buckets are tiny,
    so the shuffle is the only O(n) cost."""
    banded = signatures.withColumn(
        "band", (F.col("perm") / rows_per_band).cast("int")
    )
    keys = banded.groupBy(id_col, "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("perm", "minhash"))
                    ),
                    lambda s: s["minhash"],
                ),
            )
        ).alias("band_key")
    )
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
    md5 nibble j//4 (bit j%4); doc bit j = sign of Σ(±1). Pure column
    algebra; portable to the SQL oracle via strpos-based nibble decode."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
    toks = df.select(
        id_col, F.explode(words).alias("tok")
    ).filter(F.col("tok") != "")
    bits = toks.select(
        id_col,
        F.md5("tok").alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"),
    )
    # nibble j//4 of the md5 hex, bit j%4 → ±1 contribution
    # (SQL expr: the Python wrappers for instr/shiftright take literals only)
    contrib = F.expr(
        "(shiftright(instr('0123456789abcdef',"
        " substring(h, cast(j / 4 as int) + 1, 1)) - 1, j % 4) & 1) * 2 - 1"
    )
    return (
        bits.withColumn("c", contrib)
        .groupBy(id_col, "j")
        .agg(F.sum("c").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0,
                       F.expr("shiftleft(cast(1 as bigint), j)"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
