"""[beyond-ref] Deduplication operators at 100 TB design point.

Four tiers, all pure DataFrame plans (no Python in the hot path):

- exact: content-hash groupBy (see plans/star_queries.dedup_exact) —
  one shuffle on a 128-bit key.
- MinHash + LSH: shingle → k seeded MinHashes → b bands → bucket join.
  Candidate pairs are generated ONLY within LSH buckets, so the pair
  space is bucket-local — never an O(n²) cross join. This is the
  canonical near-dup path for web-scale corpora (cf. Broder '97
  resemblance sketches; Spark's own ml.feature.MinHashLSH uses the
  same band trick).
- SimHash: per-token hash bits vote; documents with equal fingerprints
  are near-dup groups — a single groupBy, the cheapest fuzzy tier.
- embedding cosine: see operators/similarity.py.

Hash portability: every hash is md5-based — ``conv(substr(md5(x),1,12),
16, 10)`` gives a 48-bit integer any ANSI engine can reproduce (the
DuckDB oracles use ``('0x' || substr(md5(x),1,12))::BIGINT``), so the
driver's differential check covers these operators too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_LEN = 12  # 48-bit hashes: plenty for min-ranking, no bigint overflow


def _hash48(col):
    """Portable 48-bit hash of a string column (engine-reproducible)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, HEX_LEN), 16, 10).cast(
        "long"
    )


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, token (non-empty, position order irrelevant)."""
    return docs.select(
        "doc_id", F.explode(F.split(text_col, " ")).alias("token")
    ).where(F.col("token") != "")


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """doc_id → distinct word n-gram shingles, JVM-side only.

    ``transform`` over an index sequence builds the n-grams inside one
    projection — narrow, no shuffle until the caller aggregates.
    """
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    idx = F.sequence(F.lit(0), F.size("toks") - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("toks"), i + j + 1) for j in range(n)]
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= n)
        .select("doc_id", F.explode(F.transform(idx, gram)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingled: DataFrame, k: int = 16) -> DataFrame:
    """doc_id, h0..h{k-1}: MinHash signature via double hashing.

    ONE md5 per shingle provides two independent 48-bit halves
    (hex chars 1-12 and 13-24); family i is ``h1 + i·h2``
    (Kirsch-Mitzenmacher) — k families for one hash evaluation, no
    modular arithmetic (i·h2 < 2^52, sums stay well under int64 and
    are engine-portable). Only shuffle: the groupBy(doc_id).
    """
    md5h = F.md5(F.col("shingle").cast("binary"))
    h1 = F.conv(F.substring(md5h, 1, HEX_LEN), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5h, HEX_LEN + 1, HEX_LEN), 16, 10).cast("long")
    with_h = shingled.select(
        "doc_id", h1.alias("_h1"), h2.alias("_h2")
    )
    aggs = [
        F.min(F.col("_h1") + i * F.col("_h2")).alias(f"h{i}") for i in range(k)
    ]
    return with_h.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing ≥1 LSH band.

    Bands are unpivoted map-side (stack), hashed, and self-joined on
    (band_id, band_key): the join key space is the bucket, so skew is
    bounded by bucket size — at 100 TB add a bucket-size cap / salt on
    pathological buckets (boilerplate text), cf. AQE skew split.
    """
    k = bands * rows_per_band
    stack_args = []
    for b in range(bands):
        cols = ", ".join(f"h{b * rows_per_band + j}" for j in range(rows_per_band))
        stack_args.append(f"{b}, md5(concat_ws(',', {cols}))")
    banded = signatures.selectExpr(
        "doc_id",
        f"stack({bands}, {', '.join(stack_args)}) AS (band_id, band_key)",
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame, shingled: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (LSH prunes the rest).

    Shingle co-counts come from a shingle-key join restricted to
    candidate docs (semi-join pushes the candidate filter into the
    scan side before the wide join).
    """
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select("doc_b"))
        .distinct()
    )
    sh = shingled.join(cand_docs, "doc_id", "left_semi")
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    co = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
        .join(candidates, ["doc_a", "doc_b"], "inner")
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        co.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    candidates → exact verify."""
    sh = shingles(docs, n=n)
    sigs = minhash_signatures(sh, k=k)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=k // bands)
    return verify_jaccard(cands, sh, threshold=threshold)


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """doc_id, simhash (int): per-token hash bits vote on each output
    bit; ties (sum==0) resolve to 0. Distinct tokens weight 1.

    One explode + one groupBy; the bit arithmetic is pure integer ops
    inside codegen. 16 bits keeps the demo oracle tractable; the same
    code runs at 64 bits.
    """
    toks = tokenize(docs).distinct()
    hv = _hash48(F.col("token"))
    votes = [
        F.sum(
            (F.shiftright(hv, j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_dup_groups(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Documents sharing a SimHash fingerprint, smallest id as keeper."""
    fp = simhash(docs, bits=bits)
    return (
        fp.groupBy("simhash")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("group_size") > 1)
    )
