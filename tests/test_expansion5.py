"""Round-8 expansion queries: semantic invariants on hand-built
inputs (the oracle gate checks engine equality; these check the
operators mean what they claim).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write(df, sf, name):
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, f"{name}.parquet"))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def _embs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _unit(axis: int, dim: int = 64) -> list[float]:
    v = [0.0] * dim
    v[axis] = 1.0
    return v


def test_decontamination_flags_duplicated_eval_vector(spark, tmp_path):
    """An eval vector identical to a train vector (cosine 1.0, same
    LSH bucket by construction) is flagged at BOTH thresholds; an
    eval vector orthogonal to every train vector is never flagged.
    Under the md5-mod-100 split, ids 8/16 are eval, 0..7 train."""
    from transformers_spark.expansion5 import q_embedding_decontamination

    rows = [(i, _unit(i % 4), i) for i in range(8)]  # train
    rows.append((8, _unit(0), 8))   # eval dup of train vec 0 -> cos 1.0
    rows.append((16, _unit(40), 16))  # eval orthogonal to all train
    sf = str(tmp_path / "sfdecon")
    _write(_embs(spark, rows), sf, "embeddings")
    out = {r["threshold"]: r for r in
           q_embedding_decontamination(spark, sf).collect()}
    assert set(out) == {0.2, 0.35}
    for t in (0.2, 0.35):
        assert out[t]["n_eval"] == 2
        assert out[t]["n_flagged"] == 1
        assert out[t]["flag_rate"] == pytest.approx(0.5)


def test_decontamination_empty_corpus_keeps_threshold_rows(spark, tmp_path):
    from transformers_spark.expansion5 import q_embedding_decontamination

    sf = str(tmp_path / "sfdecon0")
    _write(_embs(spark, []), sf, "embeddings")
    rows = q_embedding_decontamination(spark, sf).collect()
    assert sorted(r["threshold"] for r in rows) == [0.2, 0.35]
    assert all(r["n_eval"] == 0 and r["n_flagged"] == 0 for r in rows)
    assert all(r["flag_rate"] is None for r in rows)


def test_rrf_fusion_doc_in_both_lists_wins(spark, tmp_path):
    """A candidate ranked 1 by BOTH systems scores 2/(60+1) and beats
    any single-list candidate (max 1/61) — so it must be fused_rank 1,
    with the exact two-term score."""
    from transformers_spark.expansion5 import q_retrieval_rrf_fusion

    both = "zebra quokka wombat narwhal"
    docs = [(0, both, "en", "web", len(both))]
    docs += [(10, both, "en", "web", len(both))]  # BM25 top for query 0
    docs += [
        (i, f"filler{i} words{i} here{i}", "en", "web", 20)
        for i in range(11, 20)
    ]
    embs = [(0, _unit(0), 0), (10, _unit(0), 0)]  # cosine 1.0 pair
    embs += [(i, _unit(i % 32 + 2), 0) for i in range(11, 20)]
    sf = str(tmp_path / "sfrrf")
    _write(_docs(spark, docs), sf, "documents")
    _write(_embs(spark, embs), sf, "embeddings")
    out = q_retrieval_rrf_fusion(spark, sf)
    top = {r["query_id"]: r for r in out.filter(F.col("fused_rank") == 1).collect()}
    assert top[0]["doc_id"] == 10
    assert top[0]["rrf_score"] == pytest.approx(round(2.0 / 61.0, 6))


def test_crosslingual_near_dup_counts_cross_lang_pairs_only(spark, tmp_path):
    """Three identical texts in en/fr/en: the two cross-lingual pairs
    count (3 shared 4-gram shingles each), the same-language pair
    never."""
    from transformers_spark.expansion5 import q_crosslingual_near_dup

    text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, text, "en", "web", len(text)),
        (2, text, "fr", "web", len(text)),
        (3, text, "en", "web", len(text)),
    ]
    sf = str(tmp_path / "sfxling")
    _write(_docs(spark, rows), sf, "documents")
    out = q_crosslingual_near_dup(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lang_a"], r["lang_b"]) == ("en", "fr")
    assert r["n_pairs"] == 2  # (1,2) and (2,3); (1,3) is same-lang
    assert r["max_shared"] == 3


def test_crosslingual_df_cap_counts_null_doc_posting(spark, tmp_path):
    """The XLING_MAX_DF stop-gram cap counts a NULL-doc posting as one
    distinct document (mirroring the oracle's DISTINCT doc, gram
    count): a gram shared by exactly MAX_DF real docs pairs, but the
    same corpus plus ONE null-doc copy pushes every gram's df to
    MAX_DF + 1 and drops them all — the boundary the postings rewrite
    must preserve."""
    from transformers_spark.expansion5 import (
        XLING_MAX_DF,
        q_crosslingual_near_dup,
    )

    text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (i, text, "en" if i % 2 else "fr", "web", len(text))
        for i in range(1, XLING_MAX_DF + 1)
    ]
    sf = str(tmp_path / "sfxcap")
    _write(_docs(spark, rows), sf, "documents")
    at_cap = q_crosslingual_near_dup(spark, sf).collect()
    assert len(at_cap) == 1 and at_cap[0]["n_pairs"] == 25 * 25

    sf2 = str(tmp_path / "sfxcapnull")
    _write(_docs(spark, rows + [(None, text, "de", "web", len(text))]), sf2, "documents")
    over_cap = q_crosslingual_near_dup(spark, sf2).collect()
    assert over_cap == []


def test_shard_skew_exact_histogram(spark, tmp_path):
    """Three 40000-byte docs against the 65536-byte budget: starts
    0/40000/80000 -> shards 0 (two docs, 80000 B) and 1 (one doc,
    40000 B) -> skew = 2.0."""
    from transformers_spark.expansion5 import q_curation_shard_skew

    rows = [(i, "x", "en", "web", 40000) for i in range(3)]
    sf = str(tmp_path / "sfshard")
    _write(_docs(spark, rows), sf, "documents")
    r = q_curation_shard_skew(spark, sf).collect()[0]
    assert (r["n_shards"], r["min_docs"], r["max_docs"]) == (2, 1, 2)
    assert (r["min_bytes"], r["max_bytes"]) == (40000, 80000)
    assert r["bytes_skew"] == pytest.approx(2.0)


def test_hist_quantile_error_exact_construction(spark, tmp_path):
    """Values 5,15,...,95 for one type: every bin holds one value, so
    the p50 estimate is bin 4's lower edge (40.0) vs exact 45.0 —
    err 5.0; p90 is 80.0 vs 85.0 — err 5.0."""
    from datetime import datetime

    from transformers_spark.expansion5 import q_sketch_hist_quantile_error

    rows = [
        (i, datetime(2024, 1, 1), 1, "view", 5.0 + 10 * i, "{}")
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfhist")
    _write(ev, sf, "events")
    out = {r["q"]: r for r in
           q_sketch_hist_quantile_error(spark, sf).collect()}
    assert out[0.5]["est_value"] == pytest.approx(40.0)
    assert out[0.5]["exact_value"] == pytest.approx(45.0)
    assert out[0.5]["abs_err"] == pytest.approx(5.0)
    assert out[0.9]["est_value"] == pytest.approx(80.0)
    assert out[0.9]["exact_value"] == pytest.approx(85.0)


def test_hist_quantile_saturates_out_of_domain_values(spark, tmp_path):
    """Values outside the sketch domain [0, 1000) saturate into the
    overflow/underflow buckets instead of overflowing the bin id (the
    extreme-values gate found 1e307 breaking the raw FLOOR): five
    zeros + five 1e307 put p90 (rank ceil(0.9*10)=9) in the overflow
    bucket, whose estimate reads as the domain edge 1000.0, while the
    exact quantile keeps the raw value — the audit SHOWS the
    saturation error."""
    from datetime import datetime

    from transformers_spark.expansion5 import q_sketch_hist_quantile_error

    vals = [0.0] * 5 + [1e307] * 5
    rows = [
        (i, datetime(2024, 1, 1), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "sfhistsat")
    _write(ev, sf, "events")
    out = {r["q"]: r for r in
           q_sketch_hist_quantile_error(spark, sf).collect()}
    assert out[0.5]["est_value"] == pytest.approx(0.0)
    assert out[0.9]["est_value"] == pytest.approx(1000.0)  # overflow bin
    assert out[0.9]["exact_value"] == pytest.approx(1e307)


def test_ivf_probe_empty_corpus_raises_codebook_contract(spark, tmp_path):
    """An empty corpus cannot train/collect a codebook: the IVF probe
    curve must refuse loudly (the EMPTY_ERROR_CONTRACTS pin), never
    emit a fake zero-recall row."""
    from transformers_spark.expansion5 import q_ivf_probe_recall_curve

    sf = str(tmp_path / "sfivf0")
    _write(_embs(spark, []), sf, "embeddings")
    with pytest.raises(ValueError):
        q_ivf_probe_recall_curve(spark, sf).collect()


def test_ivf_probe_recall_is_monotone(spark, tmp_path):
    """More probes can only widen the candidate set, so recall@5 must
    be non-decreasing in n_probe, and slots equal the distinct exact
    top-5 pair count."""
    from transformers_spark.expansion5 import q_ivf_probe_recall_curve

    # 40 vectors spread over a few directions so the id<16 codebook
    # has distinct cells and probing matters
    rows = [
        (i, [float((i * 7 + d * 3) % 13) - 6.0 for d in range(64)], i % 4)
        for i in range(40)
    ]
    sf = str(tmp_path / "sfivf")
    _write(_embs(spark, rows), sf, "embeddings")
    out = {r["n_probe"]: r for r in
           q_ivf_probe_recall_curve(spark, sf).collect()}
    assert set(out) == {1, 4}
    assert out[1]["n_exact_slots"] == out[4]["n_exact_slots"] == 25
    assert out[4]["recall"] >= out[1]["recall"]
    assert 0.0 <= out[1]["recall"] <= 1.0


def test_degree_profile_buckets_hub_and_isolated(spark, tmp_path):
    """Three identical docs form a triangle (degree 2 each -> bucket
    '2-3'); a unique doc lands in bucket '0' with zero degree."""
    from transformers_spark.expansion5 import q_dedup_degree_profile

    text = "lorem ipsum dolor sit amet consectetur"
    rows = [(i, text, "en", "web", len(text)) for i in range(3)]
    rows.append((9, "completely different words entirely unrelated",
                 "en", "web", 40))
    sf = str(tmp_path / "sfdeg")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["degree_bucket"]: r for r in
           q_dedup_degree_profile(spark, sf).collect()}
    assert out["2-3"]["n_docs"] == 3
    assert out["2-3"]["total_degree"] == 6
    assert out["0"]["n_docs"] == 1
    assert out["0"]["total_degree"] == 0


def test_epoch_shuffle_covers_all_docs_and_rekeys(spark, tmp_path):
    """Every doc lands in exactly one block per epoch (n_docs == 100
    both epochs), and the two epochs assign at least one doc to
    different blocks (the re-keying that decorrelates epoch orders)."""
    import hashlib

    from transformers_spark.expansion5 import q_curation_epoch_shuffle

    rows = [(i, f"doc {i}", "en", "web", 10) for i in range(100)]
    sf = str(tmp_path / "sfep")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["epoch"]: r for r in
           q_curation_epoch_shuffle(spark, sf).collect()}
    assert set(out) == {0, 1}
    for e in (0, 1):
        assert out[e]["n_docs"] == 100
        assert 1 <= out[e]["n_blocks"] <= 64
        assert out[e]["max_block"] >= out[e]["p50_block"] >= out[e]["min_block"]

    def block(e, i):
        h = hashlib.md5(f"epoch{e}:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 64

    assert any(block(0, i) != block(1, i) for i in range(100))


def test_epoch_shuffle_empty_corpus_keeps_epoch_rows(spark, tmp_path):
    from transformers_spark.expansion5 import q_curation_epoch_shuffle

    sf = str(tmp_path / "sfep0")
    _write(_docs(spark, []), sf, "documents")
    rows = q_curation_epoch_shuffle(spark, sf).collect()
    assert sorted(r["epoch"] for r in rows) == [0, 1]
    assert all(r["n_docs"] == 0 and r["n_blocks"] == 0 for r in rows)
    assert all(r["min_block"] is None for r in rows)
