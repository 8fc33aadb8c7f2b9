"""Exact set-similarity join via prefix filtering (PPJoin-lite).

The dedup family's LSH operators (``queries/dedup.py``) trade recall for
scale; prefix filtering (Chaudhuri et al., ICDE 2006; Xiao et al. "PPJoin",
WWW 2008) is the EXACT alternative: order every document's token set by
ascending global document frequency, keep only the first ``|set| -
ceil(t*|set|) + 1`` tokens (the *prefix*), and join documents on shared
prefix tokens — any pair with Jaccard >= t MUST share a prefix token, so
the candidate set has perfect recall, and candidates are generated from the
RAREST tokens (df-ascending order), so no candidate explosion on stopwords.
A length filter (``least(n_a,n_b)*DEN >= NUM*greatest(n_a,n_b)``) prunes
further before exact verification.

Everything is engine-portable integer arithmetic: the Jaccard threshold
test is cross-multiplied (``DEN*inter >= NUM*(n_a+n_b-inter)`` for t =
NUM/DEN), so no float ever decides membership; only the reported
``jacc_ppm`` is a (deterministic, exact-integer-input) double division
rounded to micro-units.

The join runs over EXACT-DEDUP REPRESENTATIVES, not raw documents: docs
first collapse by content hash (keep-min doc_id + replica count), and the
similarity join relates distinct texts only. This is how production
pipelines order the stages (exact dedup strictly before any similarity
join) and it is also the quadratic-output guard: on a corpus where every
page is mirrored r times, pairing raw docs emits O(r^2) identical-pair
rows per group (measured: the raw form produced 250k pairs and an oracle
OOM on the 10x-replicated sf1 corpus), while the collapsed form emits each
TEXT pair once with the replica counts carried as accounting columns.

At 100 TB: the content-hash collapse is one hash aggregation (the
dedup_exact shuffle); the df table is a shingle-level aggregate
(Zipf-bounded, broadcastable); the per-document rank window partitions by
doc_id (bounded by document length, never global); the candidate join
shuffles prefix postings on shingle — postings lists are short by
construction since prefix shingles are globally rare; verification joins
are bounded by the candidate count. This is the standard exact-join
complement to MinHash in a curation pipeline (run LSH for recall
screening, prefix-join where exactness is required). The reference has no
set-similarity surface; cf. ``queries/dedup.py`` for the probabilistic
siblings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import docs_fit_broadcast, shingles, sql_shingles
from . import QuerySpec, register
from .tables import load

_T_NUM = 3  # Jaccard threshold t = 3/5 = 0.6, exact rational
_T_DEN = 5


def q_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Exact-dedup collapse first (keep-min representative per content
    # hash): the similarity join must relate distinct texts, never
    # replicas of the same text.
    # reps feeds three consumers (the rep_docs filter and both accounting
    # join sides) and toks five (sizes, dfreq, ranked, ta, tb); eager
    # localCheckpoints make each expensive subtree execute ONCE instead of
    # per consumer (the repo's shared-subplan idiom — eager, because the
    # lazy form races AQE when two query stages materialize it
    # concurrently). Measured at sf0.1: 6.7 s -> 5.5 s.
    reps = (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("th"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").cast("bigint").alias("replicas"),
        )
        .select("doc_id", "replicas")
        .localCheckpoint(eager=True)
    )
    # Broadcast the representative-id filter WHEN the corpus row count
    # proves it safe (r11: reps is one row per distinct text — unbounded
    # at corpus scale, so the r10 unconditional hint was a driver-OOM
    # path; the parquet-metadata gate keeps the hint at bench scale,
    # where it preserves the big side's scan partitioning for the
    # tokenize stage instead of shuffling raw texts by doc_id — guide
    # §3.1; r10 same-session A/B: 5.05 -> 4.87 s).
    reps_small = docs_fit_broadcast(sf_dir)
    _b = F.broadcast if reps_small else (lambda df: df)
    rep_docs = d.join(_b(reps.select("doc_id")), "doc_id")
    # 3-gram word shingles (the dedup family's discriminative unit —
    # unigram sets over a bounded vocabulary make every pair look similar).
    toks = shingles(rep_docs, "doc_id", "text").select(
        "doc_id", F.col("shingle").alias("term")
    ).localCheckpoint(eager=True)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    # Canonical df-ascending order (ties by token text): the prefix holds
    # each document's globally rarest tokens. Window partitions by doc_id —
    # bounded by document length, never a global sort.
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    ranked = (
        toks.join(F.broadcast(dfreq), "term")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    # prefix length = n - ceil(t*n) + 1
    prefix_len = (
        F.col("n")
        - F.expr(f"CAST(CEIL({_T_NUM}.0 * n / {_T_DEN}.0) AS INT)")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "term", "pos", "n"
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "term",
        F.col("pos").alias("pos_a"),
        F.col("n").alias("n_a"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "term",
        F.col("pos").alias("pos_b"),
        F.col("n").alias("n_b"),
    )
    # PPJoin positional filter (Xiao et al., WWW 2008 §3.2): a match at
    # df-order positions (pos_a, pos_b) bounds the achievable overlap at
    # 1 + min(n_a - pos_a, n_b - pos_b); Jaccard >= t needs overlap >=
    # alpha = ceil(t/(1+t)·(n_a+n_b)). Recall is intact because for any
    # qualifying pair the globally-smallest shared token is a
    # prefix-prefix match (the prefix-length lemma) and at that match the
    # bound >= the true overlap >= alpha. Exact integer ceiling with
    # positive operands: ceil(p/q) = (p + q - 1) DIV q (r11 — the r10
    # form -((-p) DIV q) is a FLOOR under Spark's truncate-toward-zero
    # DIV, i.e. one below the true alpha whenever q does not divide p:
    # recall-safe but weaker pruning; ADVICE r10).
    #
    # r11 accumulated form: the r10 per-row filter + DISTINCT kept a pair
    # if ANY single match passed the bound. Both docs order tokens by the
    # same global (df, term) key, so a pair's shared prefix tokens appear
    # in the same relative order in both prefixes; aggregating ALL
    # matches per pair gives c = |shared prefix tokens| with last-match
    # positions (mpa, mpb), and every shared token NOT counted in c lies
    # after position mpa in a AND after mpb in b (if it were inside both
    # prefixes it would be counted; outside one prefix means a later
    # global order than the last counted match, hence a later position in
    # BOTH). So overlap <= c + min(n_a - mpa, n_b - mpb) — strictly
    # tighter than the single-match bound whenever c >= 2 — and the
    # single-match existence bound (first match, largest remainder) is
    # kept as max(pass) over rows. The pair groupBy replaces the r10
    # DISTINCT: same exchange, map-side partials collapse matches per
    # pair, candidates shrink before the expensive verification joins.
    alpha_of = lambda n_sum: F.expr(
        f"CAST((({_T_NUM} * ({n_sum})) + ({_T_NUM} + {_T_DEN}) - 1)"
        f" DIV ({_T_NUM} + {_T_DEN}) AS INT)"
    )
    row_pass = (
        F.lit(1)
        + F.least(F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b"))
        >= alpha_of("n_a + n_b")
    )
    cand = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("n_a", "n_b") * F.lit(_T_DEN)
            >= F.lit(_T_NUM) * F.greatest("n_a", "n_b")
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("pos_a").alias("mpa"),
            F.max("pos_b").alias("mpb"),
            F.max(row_pass.cast("int")).alias("any_pass"),
        )
        .filter(F.col("any_pass") == 1)
        .filter(
            F.col("c")
            + F.least(F.col("n_a") - F.col("mpa"), F.col("n_b") - F.col("mpb"))
            >= alpha_of("n_a + n_b")
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    # r11 verification: per-doc token ARRAYS instead of the exploded
    # double join. The r10 form joined every candidate against both docs'
    # token rows — |cand| x |doc tokens| intermediate rows (≈3.4M at
    # sf0.1) shuffled into the pair re-aggregation. Here each doc's
    # (per-doc distinct) tokens collapse once into an array (group state
    # bounded by document length), candidates join one row per side, and
    # the exact intersection is size(array_intersect) computed in-row —
    # no pair re-aggregation exchange at all (guide §2.3 aggregate before
    # you shuffle / §3.3 explode-join avoidance). No broadcast hint:
    # arrs is doc-cardinality (AQE converts at bench scale). Wash in r10
    # at 193k candidates; a 1.5 s win at r11's 66k (paired A/B 5.02 →
    # 3.49 s; rows identical).
    arrs = toks.groupBy("doc_id").agg(F.collect_list("term").alias("arr"))
    inter = (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .select("doc_a", "doc_b", "n_a", "n_b", "inter")
    )
    verified = inter.filter(
        F.col("inter") * F.lit(_T_DEN)
        >= F.lit(_T_NUM) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
    )
    ra = reps.select(F.col("doc_id").alias("doc_a"), F.col("replicas").alias("replicas_a"))
    rb = reps.select(F.col("doc_id").alias("doc_b"), F.col("replicas").alias("replicas_b"))
    return (
        verified.join(_b(ra), "doc_a")
        .join(_b(rb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("inter").cast("bigint").alias("inter"),
            F.expr(
                "CAST(ROUND(CAST(inter AS DOUBLE)"
                " / CAST(n_a + n_b - inter AS DOUBLE) * 1000000.0) AS BIGINT)"
            ).alias("jacc_ppm"),
            "replicas_a",
            "replicas_b",
        )
    )


_SQL = f"""
WITH reps AS (
  SELECT md5(text) AS th, MIN(doc_id) AS doc_id,
         CAST(COUNT(*) AS BIGINT) AS replicas
  FROM documents GROUP BY 1
),
rep_docs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN reps r ON d.doc_id = r.doc_id
),
toks AS (
  SELECT doc_id, shingle AS term FROM ({sql_shingles('rep_docs', 'doc_id', 'text')})
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
ranked AS (
  SELECT t.doc_id, t.term, s.n,
         ROW_NUMBER() OVER (
           PARTITION BY t.doc_id ORDER BY f.df ASC, t.term ASC
         ) AS pos
  FROM toks t JOIN dfreq f ON t.term = f.term JOIN sizes s ON t.doc_id = s.doc_id
),
prefix AS (
  SELECT doc_id, term, n FROM ranked
  WHERE pos <= n - CAST(CEIL({_T_NUM}.0 * n / {_T_DEN}.0) AS INT) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n AS n_a, b.n AS n_b
  FROM prefix a JOIN prefix b
    ON a.term = b.term AND a.doc_id < b.doc_id
  WHERE least(a.n, b.n) * {_T_DEN} >= {_T_NUM} * greatest(a.n, b.n)
),
inter AS (
  SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, COUNT(*) AS inter
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.term = ta.term
  GROUP BY 1, 2, 3, 4
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_a AS BIGINT) AS n_a, CAST(i.n_b AS BIGINT) AS n_b,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(ROUND(CAST(i.inter AS DOUBLE)
            / CAST(i.n_a + i.n_b - i.inter AS DOUBLE) * 1000000.0) AS BIGINT) AS jacc_ppm,
       ra.replicas AS replicas_a,
       rb.replicas AS replicas_b
FROM inter i
JOIN reps ra ON ra.doc_id = i.doc_a
JOIN reps rb ON rb.doc_id = i.doc_b
WHERE i.inter * {_T_DEN} >= {_T_NUM} * (i.n_a + i.n_b - i.inter)
"""


register(
    QuerySpec(
        "prefix_filter_join",
        q_prefix_filter_join,
        _SQL,
        "SJ-prefix,TD-dedup",
        False,
        "Exact Jaccard>=0.6 set-similarity self-join via df-ordered prefix filtering (PPJoin-lite)",
    )
)
