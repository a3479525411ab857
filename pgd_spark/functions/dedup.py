"""Deduplication operators for corpus-scale training-data pipelines.

Four families, all expressed Spark-first:

* exact          — hash-groupBy on normalized text (one shuffle).
* n-gram Jaccard — exact character-shingle similarity via inverted-
                   index self-join (the correctness baseline).
* MinHash + LSH  — shingle → k minhashes → banded bucket join; exact
                   Jaccard verify on candidates only.  The scale path:
                   candidate generation touches only colliding bands,
                   never the full O(N²) pair space.
* SimHash        — 64-bit signature from token hashes, computed fully
                   JVM-side (64 codegen'd conditional sums), candidate
                   pairs via 16-bit band equality, Hamming verify.

All hashing is deterministic across runs/partitions (no RNG state) and
PORTABLE: a polynomial rolling hash over code points mod 2^31-1 plus a
seeded affine family (a*h+b mod 2^31-1), the same arithmetic ANSI SQL
can express — so every operator here is oracle-checkable value-for-
value against an independent SQL engine, and the family is cheaper
than k string hashes (one rolling hash per token, k affine maps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_NORM = lambda c: F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))  # noqa: E731

#: modulus for the portable hash family: 2^31-1 (Mersenne prime).
#: a*h+b stays < 2^62 — no int64 overflow in any SQL engine.
HASH_MOD = 2_147_483_647
HASH_BASE = 1009


def char_hash(
    col: Column, base: int = HASH_BASE, mod: int = HASH_MOD, length: int | None = None
) -> Column:
    """Polynomial rolling hash of a string column into [0, mod):
    fold(chars, acc -> (acc*base + codepoint) % mod), no Python.

    With ``length`` (the usual string length, e.g. the n of n-gram
    shingles) the fold unrolls to ``length`` nested codegen'd
    ascii(substr) expressions — measurably faster than the
    higher-order-function path, same value; strings of any other
    length fall back to the fold (a document shorter than n yields one
    short shingle)."""
    fold = F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )
    if length is not None:
        acc = F.lit(0).cast("long")
        for i in range(1, length + 1):
            acc = (acc * base + F.ascii(F.substring(col, i, 1))) % mod
        return F.when(F.length(col) == length, acc).otherwise(fold)
    return fold


def hash_family(k: int, seed: int = 42, mod: int = HASH_MOD) -> list[tuple[int, int]]:
    """k seeded affine maps h -> (a*h + b) % mod; the classic universal
    family.  Deterministic in (k, seed) so an oracle can regenerate the
    identical constants."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, mod), rng.randrange(0, mod)) for _ in range(k)]


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, keep_id, is_dup] — groups exact duplicates (normalized
    text) and elects the minimum id as keeper."""
    keyed = df.select(F.col(id_col), F.md5(_NORM(F.col(text_col))).alias("k"))
    keepers = keyed.groupBy("k").agg(F.min(id_col).alias("keep_id"))
    return (
        keyed.join(keepers, "k")
        .select(
            F.col(id_col),
            F.col("keep_id"),
            (F.col(id_col) != F.col("keep_id")).alias("is_dup"),
        )
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a NARROW input up to the cluster's parallelism before
    a per-document explode.  A small corpus often arrives as one file →
    one partition, and the shingle/token explode then runs serially
    (measured: 17 s single-task vs <2 s spread at sf0.1); the text
    shuffle this costs is tiny next to the explode it parallelizes.
    Inputs that already have enough partitions pass through untouched —
    no shuffle is added on a real corpus-scale read."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """[id, shingle] distinct character n-grams of normalized text.
    Generated JVM-side: sequence + transform + explode, no Python."""
    df = _spread(df)
    norm = _NORM(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - n + 1, F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def _materialize_and_release(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """Run the plan once (EAGERLY — callers pay the full dedup compute
    at call time, not at first action; the result is SMALL, near-dup
    pair lists are O(duplicates) bounded by the bucket caps), then
    release every internal cache.  The dedup operators cache their
    shingle/signature tables because one plan reads them 3-4 times; a
    lazily-returned DataFrame can't unpersist those caches without
    losing them, so they leaked for the life of the session (ADVICE r3:
    41.6 s minhash bench held two shingle caches forever).

    Durability (ADVICE r4): if the session has a RELIABLE checkpoint
    dir configured (``sc.setCheckpointDir``), the result is cut with
    ``checkpoint()`` — it survives executor loss / dynamic
    deallocation, the right mode on a real cluster.  Without one it
    falls back to ``localCheckpoint``: executor-held blocks with NO
    recompute path if an executor dies — fine for local mode, so
    cluster deployments of the dedup operators should set a
    checkpoint dir (as the pregel suite's checkpoint_dir already
    does for iterative state)."""
    sc = out.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        out = out.checkpoint(eager=True)
    else:
        out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_postings: int | None = None,
) -> DataFrame:
    """[id_a < id_b, jaccard] — exact n-gram Jaccard over an inverted-
    index self-join.  ``max_postings`` drops shingles occurring in more
    than that many docs (stopword-shingle blowup guard at corpus scale;
    None = exact).  Executes eagerly and releases its internal caches
    (see _materialize_and_release)."""
    sh = _shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    postings = sh
    if max_postings is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("c")).filter(F.col("c") > max_postings)
        postings = sh.join(hot.select("shingle"), "shingle", "left_anti")
    a = postings.select(F.col("id").alias("id_a"), "shingle")
    b = postings.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return _materialize_and_release(out, sh)


def _sig_from_shingles(sh: DataFrame, num_hashes: int, seed: int) -> DataFrame:
    """[id, sig] from a prepared [id, shingle, rh] table: k affine maps
    of the one rolling hash, k min-aggregations in one shuffle."""
    fam = hash_family(num_hashes, seed)
    mins = [
        F.min((F.lit(a) * F.col("rh") + F.lit(b)) % HASH_MOD).alias(f"h{i}")
        for i, (a, b) in enumerate(fam)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """[id, sig: array<long>] — k independent minhashes; ONE rolling
    hash per shingle, then k affine maps (a_i*h+b_i mod 2^31-1) — k
    aggregations in one shuffle, portable arithmetic throughout."""
    sh = _shingles(df, id_col, text_col, n).withColumn(
        "rh", char_hash(F.col("shingle"), length=n)
    )
    return _sig_from_shingles(sh, num_hashes, seed)


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket_size: int | None = 1000,
    seed: int = 42,
) -> DataFrame:
    """[id_a, id_b, jaccard] near-dup pairs: banded-LSH candidates,
    then EXACT n-gram Jaccard verification of candidates only (no
    false positives; recall is the standard 1-(1-s^r)^b curve —
    defaults r=8,b=16 put the S-curve knee at ≈(1/16)^(1/8)≈0.71).

    ``max_bucket_size`` skips band-buckets larger than the cap: on
    boilerplate-heavy corpora a mega-bucket means thousands of mutual
    near-dups whose pair list is quadratic; the cap bounds the worst
    case while other bands still recall pairs (None = no cap).

    Physical shape (r7, guide §2.3/§2.4 — same output value-for-value
    as the r6 plan, which shuffled the shingle table twice and the
    banded table three times):

    * ONE wide aggregation per doc computes the 128 minhashes, the int
      verify-set array, its size, AND the hash-injectivity stats
      together — the shingle stream crosses exactly one shuffle and is
      never cached.
    * Band buckets are ARRAYS of the band's minhash values (grouping on
      an array key ≡ the old injective comma-joined string, minus the
      string building), and candidate pairs come from ONE groupBy
      (collect ids per bucket, cap-filter, dedup the member arrays,
      pair-explode) instead of bucket-size-filter join + self-join; the
      pair dedup rides an explicit-width repartition so the verify
      stage keeps full parallelism (AQE would coalesce the slim pair
      rows onto a handful of tasks and serialize the array intersects).
    * The exact verify intersects INT64 rolling-hash arrays instead of
      string arrays whenever the per-doc stats prove the rolling hash
      injective on this corpus (every shingle length-n, every code
      point < HASH_BASE, HASH_BASE**n < HASH_MOD → a positional
      encoding with no modular wrap), with an exact distinct-count
      equality check as the secondary gate and the old string arrays as
      the final fallback — |A∩B| is the r6 value on every path.  The
      doc-set side broadcasts when its estimated HashedRelation fits
      the session broadcast threshold (candidates then never shuffle),
      else SHUFFLE_HASH.

    Executes eagerly and releases its caches before returning (see
    _materialize_and_release)."""
    rows = num_hashes // bands
    sh = _shingles(df, id_col, text_col, n).withColumn(
        "rh", char_hash(F.col("shingle"), length=n)
    )
    fam = hash_family(num_hashes, seed)
    mins = [
        F.min((F.lit(a) * F.col("rh") + F.lit(b)) % HASH_MOD).alias(f"h{i}")
        for i, (a, b) in enumerate(fam)
    ]
    # ONE pass over the shingle stream computes, per doc: the k
    # minhashes, the int verify-set, its size, AND the injectivity-
    # proof stats — the shingle table is never materialized or cached.
    per_doc = (
        sh.groupBy("id")
        .agg(
            *mins,
            F.collect_list("rh").alias("shs"),
            F.count(F.lit(1)).alias("sz"),
            F.sum((F.length("shingle") != n).cast("long")).alias("_bad"),
            F.max(
                F.greatest(*[F.ascii(F.substring("shingle", i + 1, 1)) for i in range(n)])
            ).alias("_mcp"),
        )
        .cache()
    )
    # materialize BEFORE the final job: three of its subtrees (the
    # banded candidate side and both verify broadcast builds) read
    # per_doc concurrently, and racing an unpopulated cache recomputes
    # the whole 128-min aggregation once per subtree.  The count is
    # also the doc count the broadcast sizing below needs.
    n_docs = per_doc.count()
    # int-verify proof: when every shingle has length n, every code
    # point is < HASH_BASE, and HASH_BASE**n < HASH_MOD, the rolling
    # hash is a base-HASH_BASE positional encoding with no modular wrap
    # — injective outright, so |A∩B| over the int arrays equals |A∩B|
    # over the strings.  Otherwise fall back to the corpus-wide
    # distinct-count equality check (exact; one extra shingle pass),
    # and failing that re-aggregate STRING verify sets (the r6 plan).
    n_rows, bad_len, max_cp = per_doc.agg(
        F.sum("sz"), F.sum("_bad"), F.max("_mcp")
    ).first()
    n_rows = n_rows or 0  # empty corpus → null sums
    use_int = (bad_len or 0) == 0 and (max_cp or 0) < HASH_BASE and HASH_BASE**n < HASH_MOD
    if not use_int:
        d_sh, d_rh = sh.agg(F.countDistinct("shingle"), F.countDistinct("rh")).first()
        use_int = d_sh == d_rh
    banded = per_doc.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.array(
                            *[F.col(f"h{bi * rows + r}") for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    grouped = banded.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    # near-dup clusters collide in MOST of their bands, so the same id
    # array recurs ~bands times; deduping the member ARRAYS first cuts
    # the pair explosion by that factor (union of cliques ≡ union of
    # the distinct cliques), the final pair distinct handles overlap
    # spread the verify: candidate rows are only ~16 bytes, so AQE
    # coalesces a plain distinct down to a handful of partitions (6 at
    # sf0.1) — but every row above it fans into an array-intersect far
    # heavier than its shuffle bytes, serializing the verify on a
    # near-idle cluster.  Repartitioning by the pair key at an explicit
    # width (user-specified counts are exempt from AQE coalescing)
    # keeps the verify at full parallelism, and dropDuplicates on data
    # already hash-partitioned by its keys adds no second exchange.
    npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    cand = (
        grouped.filter(F.size("ids") >= 2)
        .select("ids")
        .distinct()
        .select(F.posexplode("ids").alias("_i", "id_a"), F.col("ids"))
        .select(
            "id_a",
            F.explode(F.slice("ids", F.col("_i") + 2, F.size("ids"))).alias("id_b"),
        )
        .repartition(npart, F.col("id_a"), F.col("id_b"))
        .dropDuplicates()
    )
    # exact verify on the candidate set via per-doc set ARRAYS +
    # array_intersect: two id-keyed joins carry O(candidates) rows, each
    # holding one bounded doc-set array (shingle count ≤ text length,
    # which a corpus pipeline chunks) — the exploded (id, shingle)
    # equi-join variant materialized O(candidates × shingles) join rows
    # (266M at sf0.1, 18.6 s).  Counts are identical: |set ∩ set| over
    # the same distinct shingles (see the int-hash proof above).
    from ..session import parse_size_bytes

    threshold_b = parse_size_bytes(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "67108864"),
        default=64 * 1024 * 1024,
    )
    # both verify-join sides project the cached per_doc table, so each
    # broadcast build is a 5k-row cache scan, not a recomputation
    est = 48 * n_docs + (16 if use_int else 56) * n_rows
    caches = [per_doc]
    if use_int:
        doc_sets = per_doc.select("id", "shs", "sz")
    else:
        # rare path (hash provably or possibly collides): string verify
        # sets, re-aggregated once and cached (both join sides read it)
        doc_sets = sh.groupBy("id").agg(
            F.collect_list("shingle").alias("shs"), F.count(F.lit(1)).alias("sz")
        ).cache()
        doc_sets.count()
        caches.append(doc_sets)

    def _ds(alias_id: str, alias_shs: str, alias_sz: str):
        side = doc_sets.select(
            F.col("id").alias(alias_id),
            F.col("shs").alias(alias_shs),
            F.col("sz").alias(alias_sz),
        )
        return F.broadcast(side) if 0 < est <= threshold_b else side.hint("shuffle_hash")

    out = (
        cand.join(_ds("id_a", "sa", "sz_a"), "id_a")
        .join(_ds("id_b", "sb", "sz_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return _materialize_and_release(out, *caches)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", seed: int = 42
) -> DataFrame:
    """[id, simhash: long] — 64-bit SimHash over whitespace tokens,
    entirely JVM-side: one rolling hash per token, bit b's indicator is
    the parity of the b-th affine map of it ((a_b*h+c_b mod 2^31-1)
    mod 2, 64 independent-parity bits), each token contributes ±1 per
    bit, sign of the bit-sum sets the signature bit."""
    fam = hash_family(64, seed)
    df = _spread(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(_NORM(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.length("tok") > 0).withColumn("rh", char_hash(F.col("tok")))
    sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(((F.lit(a) * F.col("rh") + F.lit(b_)) % HASH_MOD) % 2 == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b, (a, b_) in enumerate(fam)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return sums.select("id", sig.alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """[id_a, id_b, hamming] — SimHash near-dups: 4×16-bit quarter
    buckets (any pair within Hamming ≤3 of 64 bits shares ≥1 exact
    16-bit quarter by pigeonhole) via one groupBy-collect +
    pair-explode, then exact Hamming verify.  Executes eagerly (see
    _materialize_and_release)."""
    sig = simhash_signatures(df, id_col, text_col)
    quarters = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftrightunsigned("simhash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "simhash", "s.q", "s.qv")
    # candidate pairs from ONE groupBy per quarter-bucket, carrying the
    # signatures inside the collected structs so no rejoin is needed
    # (r7 — the old plan cached the signature table and shuffled the
    # exploded quarters three times: bucket self-join both sides plus
    # the pair distinct); sort_array orders by id (the struct's leading
    # field, unique), so slice-pairs reproduce x.id < y.id exactly.
    members = quarters.groupBy("q", "qv").agg(
        F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("ms")
    )
    cand = (
        members.filter(F.size("ms") >= 2)
        .select(F.posexplode("ms").alias("_i", "a"), F.col("ms"))
        .select("a", F.explode(F.slice("ms", F.col("_i") + 2, F.size("ms"))).alias("b"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _materialize_and_release(out)


def dup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """[doc_id, canonical_id, keep] — close a near-dup PAIR list (from
    any of exact/jaccard/minhash/simhash/embedding dedup) into duplicate
    CLUSTERS and pick one canonical survivor per cluster.

    Near-duplication is not transitive, but production dedup keeps one
    doc per CONNECTED component of the pair graph (the standard
    MinHash-dedup contract — e.g. the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" pipeline); canonical =
    the component's minimum doc id, so the keep-set is deterministic.

    The closure IS our link-graph engine: the pair list becomes a
    :class:`~pgd_spark.graph.Graph` and components come from the
    Pregel ``connected_components`` operator (hashmin; O(diameter)
    rounds — dup clusters are near-cliques, so 2-3 rounds), which
    means the same skew handling, lazy round-chaining, and
    checkpoint/resume apply at corpus scale.  Docs in no pair are
    their own canonical (``keep = 1``).

    ``docs`` (optional): the full corpus frame; when given, every doc
    id appears in the output (singletons included) — omit it to get
    only the docs that are in some duplicate cluster.

    Doc ids must be integral (int64 vertex ids — the link-graph
    contract).  Non-integral ids would silently cast to null, drop
    every edge, and report keep=1 for all docs (ADVICE r5), so the id
    columns are schema-checked up front; map string ids through a
    vertex map (sources.transcripts.vertex_map pattern) first.
    """
    from ..graph import Graph
    from ..operators.pregel import connected_components

    integral = ("tinyint", "smallint", "int", "bigint")
    for frame, col, what in ((pairs, a_col, "pairs"), (pairs, b_col, "pairs")) + (
        ((docs, id_col, "docs"),) if docs is not None else ()
    ):
        # Spark resolves column names case-insensitively — match that
        # here, and accept decimal(p,0) ids (they cast to long cleanly);
        # a truly absent column gets its own error (ADVICE r6)
        dtypes = {k.lower(): v for k, v in frame.dtypes}
        dt = dtypes.get(col.lower())
        if dt is None:
            raise TypeError(f"dup_clusters: column {col!r} not found in {what}")
        if dt not in integral and not (dt.startswith("decimal(") and dt.endswith(",0)")):
            raise TypeError(
                f"dup_clusters requires integral (int64) doc ids; {what}.{col} "
                f"is {dt!r} — map ids to int64 first (e.g. a vertex map)"
            )

    g = Graph.from_edges(pairs, src=a_col, dst=b_col)
    cc = connected_components(g, checkpoint_dir=checkpoint_dir)
    clustered = cc.select(
        F.col("v").alias(id_col), F.col("component").alias("canonical_id")
    )
    if docs is not None:
        everyone = docs.select(F.col(id_col).cast("long").alias(id_col)).distinct()
        clustered = (
            everyone.join(clustered, id_col, "left")
            .select(
                id_col,
                F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
            )
        )
    return clustered.withColumn(
        "keep", (F.col(id_col) == F.col("canonical_id")).cast("int")
    )
