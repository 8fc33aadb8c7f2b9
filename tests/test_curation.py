"""Semantic invariants for the round-3 curation operators
(queries/curation.py). Exact cross-engine parity is covered by the
parametrized sweep in test_oracle_parity.py; these tests pin the
*meaning* of each result so a parity-preserving refactor cannot silently
change semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.queries import load_all

from conftest import SF_DIR_ORACLE

REG = load_all()


def _rows(spark, name):
    return {  # keyed by first column for easy lookups
        r[0]: r.asDict() for r in REG[name].build(spark, SF_DIR_ORACLE).collect()
    }


def test_substring_spans_bounded_and_present(spark):
    rows = _rows(spark, "substring_span_dedup")
    assert len(rows) == 500  # one row per document, including span-free docs
    assert any(r["n_dup_spans"] > 0 for r in rows.values()), (
        "testdata contains injected near-duplicates; spans must be found"
    )
    for r in rows.values():
        # spans are merged intervals inside the doc: coverage is bounded
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]
        assert 0 <= r["dup_ratio_ppm"] <= 1_000_000
        # a span covers at least one full k-gram window (8 tokens)
        if r["n_dup_spans"] > 0:
            assert r["dup_tokens"] >= 8 * 1  # >= k tokens per span, >=1 span
            assert r["dup_tokens"] >= 8 * r["n_dup_spans"] - 0  # k per span min
        else:
            assert r["dup_tokens"] == 0


def test_temperature_mix_flattens_distribution(spark):
    rows = _rows(spark, "temperature_mix")
    assert set(rows) == {"en", "es", "de", "fr", "zh"}
    # alpha=0.5 rebalancing: the rarest language is upsampled to rate 1.0,
    # the dominant language is downsampled below 1.0
    rare = min(rows.values(), key=lambda r: r["n_before"])
    dominant = max(rows.values(), key=lambda r: r["n_before"])
    assert rare["rate_ppm"] == 1_000_000
    assert dominant["rate_ppm"] < 1_000_000
    assert dominant["n_kept"] < dominant["n_before"]
    # weights normalize to ~1 (ppm rounding slack of one per language)
    total_w = sum(r["weight_ppm"] for r in rows.values())
    assert abs(total_w - 1_000_000) <= len(rows)
    # keep-decisions are a subset of each language's documents
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_before"]


def test_diversity_prune_respects_quota(spark):
    rows = _rows(spark, "diversity_prune")
    total = sum(r["n_total"] for r in rows.values())
    assert total == 500
    cap = -(-total // 10)  # ceil(total * 0.1)
    for r in rows.values():
        assert r["n_kept"] == min(r["n_total"], cap)
        assert r["n_dropped"] == r["n_total"] - r["n_kept"]
    # the sign-contrast buckets actually spread the corpus
    assert len(rows) > 4


def test_quality_logreg_scores_split_the_corpus(spark):
    rows = _rows(spark, "quality_logreg")
    assert len(rows) == 500
    for r in rows.values():
        assert 0 < r["score_ppm"] < 1_000_000  # sigmoid is open-interval
        assert r["kept"] in (0, 1)
        assert r["kept"] == (1 if r["score_ppm"] >= 145_000 else 0)
    kept = sum(r["kept"] for r in rows.values())
    # the threshold sits near the corpus median: both classes non-trivial
    assert 100 < kept < 400


def test_vocab_growth_is_monotone_heaps_curve(spark):
    out = REG["vocab_growth"].build(spark, SF_DIR_ORACLE).orderBy("decile").collect()
    assert [r["decile"] for r in out] == list(range(10))
    assert sum(r["new_types"] for r in out) == out[-1]["cum_types"]
    assert sum(r["n_tokens"] for r in out) == out[-1]["cum_tokens"]
    cum_t = [r["cum_types"] for r in out]
    assert cum_t == sorted(cum_t)
    # Heaps' law: type growth decelerates — the last decile adds fewer new
    # types than the first (which adds its entire vocabulary)
    assert out[-1]["new_types"] < out[0]["new_types"]


def test_incremental_dedup_planted_statuses(spark, tmp_path):
    """TD-dedup-incr semantics on a planted corpus: a batch doc identical
    to an index doc is exact_dup, a one-word variant of an index doc is
    near_dup (LSH band collision), a later copy of an earlier batch doc
    is batch_dup, and a novel doc is kept. Statuses are deterministic
    (md5-based MinHash), pinned against the DuckDB-verified outcome."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 3, 5, 8, 13, 4, 9],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta theta",
                "one two three four five six seven eight nine ten",
                "unique totally different words appear here nowhere else",
                "unique totally different words appear here nowhere else",
                "one two three four five six seven eight nine ten",
                "one two three four five six seven eight nine eleven",
            ],
            "lang": ["en"] * 7,
            "source": ["t"] * 7,
        }
    )
    spark.createDataFrame(docs).write.parquet(str(tmp_path / "documents.parquet"))
    from lakehouse_spain_mobility_spark.queries.increment import q_incremental_dedup

    got = {r["doc_id"]: r["status"] for r in q_incremental_dedup(spark, str(tmp_path)).collect()}
    assert got == {
        3: "exact_dup",   # byte-identical to index doc 0
        4: "exact_dup",   # byte-identical to index doc 5
        8: "kept",        # novel content
        9: "near_dup",    # one-word variant of index doc 5
        13: "batch_dup",  # copy of EARLIER batch doc 8
    }


def test_maxsim_dominates_diagonal_alignment(spark):
    """ANN-maxsim semantics: for every returned document, the MaxSim
    score (each query subvector free to match its BEST document
    subvector) must dominate the forced diagonal alignment
    sum_i dot(q_i, d_i) — recomputed independently with numpy — and the
    ranking must be descending with ranks 1..20."""
    import numpy as np
    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        (r["rank"], r["vec_id"], r["maxsim_ppm"])
        for r in load_all()["maxsim_rerank"].build(spark, sf).collect()
    )
    assert [r[0] for r in rows] == list(range(1, 21))
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet").set_index("vec_id")["embedding"]
    q = np.asarray(emb.loc[0], dtype=np.float64).reshape(4, 16)
    for _, vid, ppm in rows:
        d = np.asarray(emb.loc[vid], dtype=np.float64).reshape(4, 16)
        diag = sum(float(q[i] @ d[i]) for i in range(4))
        assert ppm >= round(diag * 1e6) - 1  # quantization slack


def test_bitext_margin_pairs_are_true_best_and_margin_dominant(spark):
    """TD-bitext semantics: every returned (src, tgt) pair must be the
    TRUE cosine argmax over the whole target side (verified with numpy),
    and its ratio margin must exceed 1 (the pair beats the mean of both
    sides' top-4 neighborhoods)."""
    import numpy as np
    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all

    sf = "/root/testdata/sf0.001"
    rows = load_all()["bitext_margin"].build(spark, sf).collect()
    assert rows
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    A = emb[emb.label == 0].set_index("vec_id")["embedding"]
    B = emb[emb.label == 1].set_index("vec_id")["embedding"]
    Bm = np.stack([np.asarray(v, dtype=np.float64) for v in B])
    Bn = Bm / np.linalg.norm(Bm, axis=1, keepdims=True)
    b_ids = np.asarray(B.index)
    for r in rows:
        q = np.asarray(A.loc[r["src_id"]], dtype=np.float64)
        cos = Bn @ (q / np.linalg.norm(q))
        # argmax with the query's ppm quantization + tgt_id tie-break
        ppm = np.round(cos * 1e6).astype(np.int64)
        order = sorted(zip(-ppm, b_ids))
        assert order[0][1] == r["tgt_id"], (r["src_id"], order[0], r["tgt_id"])
        assert r["margin_ppm"] > 1_000_000


def test_bpe_first_merge_is_true_argmax_pair(spark):
    """TXT-bpe semantics: round-1's merge rule must be the genuinely most
    frequent adjacent character pair over the frequency-weighted word
    vocabulary — recomputed independently in pandas — and round 2 must
    report a pair from the POST-merge symbol space with a positive count."""
    import re
    from collections import Counter

    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all

    sf = "/root/testdata/sf0.001"
    rows = {r["iter"]: r for r in load_all()["bpe_merges"].build(spark, sf).collect()}
    assert set(rows) == {1, 2}
    docs = pd.read_parquet(f"{sf}/documents.parquet")["text"]
    wc = Counter()
    for t in docs:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                wc[w] += 1
    pc = Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += n
    best = max(pc.items(), key=lambda kv: (kv[1], *map(lambda c: -ord(c), "".join(kv[0]))))
    # tie-break: max count, then lexicographically smallest (a, b)
    top_cnt = max(pc.values())
    cands = sorted(k for k, v in pc.items() if v == top_cnt)
    assert (rows[1]["a"], rows[1]["b"]) == cands[0]
    assert rows[1]["pair_count"] == top_cnt
    assert rows[2]["pair_count"] > 0
    merged1 = rows[1]["a"] + rows[1]["b"]
    assert (rows[2]["a"], rows[2]["b"]) != (rows[1]["a"], rows[1]["b"])
    # round-2 symbols live in the post-merge space: each side is either a
    # single char or the round-1 merged symbol
    for side in (rows[2]["a"], rows[2]["b"]):
        assert len(side) == 1 or side == merged1


def test_repetition_quality_empty_and_single_word_docs(spark):
    """Empty/1-word docs must contribute ZERO bigrams (sequence(1,0) is a
    descending [1,0] in Spark — the phantom-row trap ADVICE r3 flagged in
    line_dedup; same guard here). The planted corpus pins the per-lang
    rollup to the values only the guarded form produces."""
    import os
    import tempfile

    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all

    reg = load_all()
    corpus = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["", "one", "a a a a", "x y x y"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 3, 7, 7],
        }
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(corpus).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        rows = reg["repetition_quality"].build(spark, td).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    # only docs 2 and 3 have bigrams; phantom ("","") rows from docs 0/1
    # would bump n_docs to 4 and shift both averages
    assert r["n_docs"] == 2, r
    # exact values come from the registered DuckDB twin on the same
    # planted corpus (generate_series(1, 0) is empty there by definition)
    import duckdb

    con = duckdb.connect()
    con.register("documents", corpus)
    want = dict(
        zip(
            [c[0] for c in con.execute(reg["repetition_quality"].oracle).description],
            con.execute(reg["repetition_quality"].oracle).fetchone(),
        )
    )
    for k in ("n_docs", "n_flagged", "avg_dup_bigram_frac_ppm", "avg_top_bigram_share_ppm"):
        assert r[k] == want[k], (k, r, want)


def test_embeddings_vec_id_globally_unique(spark):
    """The bitext scoring pass groups neighborhoods by vec_id ALONE (the
    side split is a max() aggregate output, queries/similarity.py) — only
    correct because vec_id is globally unique ACROSS labels, so src/tgt
    key spaces are disjoint. Pin that data invariant here (ADVICE r7): a
    per-label id space would silently merge neighborhoods and corrupt
    margins. scripts/make_sf1.py preserves it by key-offset replication."""
    from lakehouse_spain_mobility_spark.queries.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    r = emb.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("vec_id").alias("d")
    ).first()
    assert r["n"] == r["d"] > 0, (r["n"], r["d"])


def test_bitext_margin_lsh_candidates_sound_and_margin_dominant(spark):
    """TD-bitext-lsh semantics (VERDICT r4 #2 — the candidate-bounded
    production path): every returned (src, tgt) pair must actually share
    at least one 8-bit sign band (candidate soundness, recomputed with
    numpy), be the cosine argmax over the src's CANDIDATE set, and carry
    a ratio margin > 1 over the candidate neighborhoods."""
    import numpy as np
    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries.similarity import (
        _BTL_BANDS,
        _BTL_BITS,
    )

    sf = "/root/testdata/sf0.01"
    rows = load_all()["bitext_margin_lsh"].build(spark, sf).collect()
    assert rows, "candidate path returned no pairs at sf0.01"
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")

    def bands(vec):
        v = np.asarray(vec, dtype=np.float64)
        return [
            sum((1 << b) for b in range(_BTL_BITS) if v[band * _BTL_BITS + b] > 0)
            for band in range(_BTL_BANDS)
        ]

    A = emb[emb.label == 0].set_index("vec_id")["embedding"]
    B = emb[emb.label == 1].set_index("vec_id")["embedding"]
    a_bands = {i: bands(v) for i, v in A.items()}
    b_bands = {i: bands(v) for i, v in B.items()}

    def cand_tgts(src_id):
        sb = a_bands[src_id]
        return [
            t for t, tb in b_bands.items()
            if any(sb[i] == tb[i] for i in range(_BTL_BANDS))
        ]

    for r in rows:
        cands = cand_tgts(r["src_id"])
        assert r["tgt_id"] in cands  # soundness: pair shares a band
        # argmax over the candidate set (ppm-quantized, tgt_id tie-break)
        q = np.asarray(A.loc[r["src_id"]], dtype=np.float64)
        qn = q / np.linalg.norm(q)
        scored = []
        for t in cands:
            tv = np.asarray(B.loc[t], dtype=np.float64)
            ppm = round(float(qn @ (tv / np.linalg.norm(tv))) * 1e6)
            scored.append((-ppm, t))
        scored.sort()
        assert scored[0][1] == r["tgt_id"], (r["src_id"], scored[0], r["tgt_id"])
        assert r["margin_ppm"] > 1_000_000
