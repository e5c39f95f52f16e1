"""Round-9 expansion queries: semantic invariants on hand-built
inputs (the oracle gate checks engine equality; these check the
operators mean what they claim).

Split membership under the md5-mod-100 default split, used by the
leakage tests (computed from the same h32 scheme the engine uses):
train ⊇ {0..7, 9..15}, val ∋ {16, 19, 21}, test ∋ {8, 20, 25}.
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


def test_hard_negatives_excludes_same_label(spark, tmp_path):
    """A same-label twin (cosine 1.0) is NEVER a hard negative; the
    top negative is the closest different-label vector."""
    from transformers_spark.expansion6 import q_similarity_hard_negatives

    rows = [
        (0, _unit(0), 1),       # query
        (10, _unit(0), 1),      # same label, cosine 1.0 -> excluded
        (11, _unit(0), 2),      # different label, cosine 1.0 -> rank 1
        (12, _unit(5), 2),      # different label, orthogonal -> rank 2+
    ]
    sf = str(tmp_path / "sfhn")
    _write(_embs(spark, rows), sf, "embeddings")
    out = q_similarity_hard_negatives(spark, sf).collect()
    by_rank = {r["rank"]: r for r in out if r["query_id"] == 0}
    assert 10 not in {r["neighbor_id"] for r in out}
    assert by_rank[1]["neighbor_id"] == 11
    assert by_rank[1]["cosine"] == pytest.approx(1.0)
    assert by_rank[1]["neg_label"] == 2


def test_hard_negatives_drops_null_labels(spark, tmp_path):
    from transformers_spark.expansion6 import q_similarity_hard_negatives

    rows = [(0, _unit(0), 1), (10, _unit(0), None)]
    sf = str(tmp_path / "sfhn2")
    _write(_embs(spark, rows), sf, "embeddings")
    assert q_similarity_hard_negatives(spark, sf).count() == 0


def test_split_leakage_counts_cross_split_fingerprints(spark, tmp_path):
    """doc 0 (train) and doc 8 (test) share content -> exactly one
    leaked fingerprint and one leaked doc on the (train, test) pair;
    the other pairs stay zero (all rows still present, #13)."""
    from transformers_spark.expansion6 import q_split_leakage_exact

    rows = [
        (0, "shared leaked content here", "en", "web", 26),   # train
        (8, "shared leaked content here", "en", "web", 26),   # test
        (1, "unique train text", "en", "web", 17),            # train
        (16, "unique val text", "en", "web", 15),             # val
    ]
    sf = str(tmp_path / "sfleak")
    _write(_docs(spark, rows), sf, "documents")
    out = {(r["split_a"], r["split_b"]): r
           for r in q_split_leakage_exact(spark, sf).collect()}
    assert set(out) == {("train", "val"), ("train", "test"),
                        ("val", "test")}
    assert out[("train", "test")]["n_shared_fingerprints"] == 1
    assert out[("train", "test")]["n_leaked_docs"] == 1
    assert out[("train", "val")]["n_shared_fingerprints"] == 0
    assert out[("val", "test")]["n_leaked_docs"] == 0


def test_token_savings_charges_removed_doc_source(spark, tmp_path):
    """Keeper = MIN doc_id globally; the duplicate is charged to the
    REMOVED doc's source, not the keeper's."""
    from transformers_spark.expansion6 import q_dedup_token_savings

    rows = [
        (0, "dup text here", "en", "src_keep", 13),
        (1, "dup text here", "en", "src_dup", 13),   # removed (3 toks)
        (2, "solo text", "en", "src_dup", 9),
    ]
    sf = str(tmp_path / "sftok")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["source"]: r for r in q_dedup_token_savings(spark, sf).collect()}
    assert out["src_keep"]["n_dup_docs"] == 0
    assert out["src_keep"]["tokens_removed"] == 0
    assert out["src_dup"]["n_dup_docs"] == 1
    assert out["src_dup"]["tokens_removed"] == 3
    assert out["src_dup"]["tokens_total"] == 5
    assert out["src_dup"]["savings_rate"] == pytest.approx(0.6)


def test_gini_identities(spark, tmp_path):
    """simpson + gini == 1 exactly; a single-language source has
    simpson 1 / gini 0; a perfectly even k-language source has
    simpson 1/k."""
    from transformers_spark.expansion6 import q_source_language_gini

    rows = (
        [(i, "t", "en", "mono", 1) for i in range(4)]
        + [(10 + i, "t", lang, "even", 1)
           for i, lang in enumerate(["en", "de", "fr", "id"])]
    )
    sf = str(tmp_path / "sfgini")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["source"]: r for r in q_source_language_gini(spark, sf).collect()}
    assert out["mono"]["simpson"] == pytest.approx(1.0)
    assert out["mono"]["gini"] == pytest.approx(0.0)
    assert out["even"]["simpson"] == pytest.approx(0.25)
    assert out["even"]["gini"] == pytest.approx(0.75)
    for r in out.values():
        assert r["simpson"] + r["gini"] == pytest.approx(1.0, abs=2e-6)


def test_quality_by_cluster_size_classes(spark, tmp_path):
    """2 copies -> small_2_3; 4 copies -> large_4_plus; singleton ->
    unique; all three class rows always present."""
    from transformers_spark.expansion6 import (
        q_dedup_quality_by_cluster_size,
    )

    rows = (
        [(0, "solo document text", "en", "s", 18)]
        + [(10 + i, "twice duplicated text", "en", "s", 21)
           for i in range(2)]
        + [(20 + i, "four way duplicated text", "en", "s", 24)
           for i in range(4)]
    )
    sf = str(tmp_path / "sfqc")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["cluster_class"]: r
           for r in q_dedup_quality_by_cluster_size(spark, sf).collect()}
    assert set(out) == {"unique", "small_2_3", "large_4_plus"}
    assert out["unique"]["n_docs"] == 1 and out["unique"]["n_clusters"] == 1
    assert out["small_2_3"]["n_docs"] == 2
    assert out["small_2_3"]["n_clusters"] == 1
    assert out["large_4_plus"]["n_docs"] == 4
    assert out["large_4_plus"]["n_clusters"] == 1


def test_yield_report_funnel_is_monotone(spark, tmp_path):
    """Docs and tokens never increase down the funnel; dedup removes
    the non-keeper copy; the quality stage removes the digit-soup doc;
    all four stage rows present."""
    from transformers_spark.expansion6 import q_curation_yield_report

    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps for a while in the sun with a friend of the house"
    )
    rows = [
        (0, good, "en", "s", len(good)),
        (1, good, "en", "s", len(good)),            # exact dup -> removed
        (2, "9283 1231 442 99 31 7", "en", "s", 21),  # digit soup -> filtered
    ]
    sf = str(tmp_path / "sfyield")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["stage_ord"]: r for r in q_curation_yield_report(spark, sf).collect()}
    assert [out[i]["stage"] for i in (1, 2, 3, 4)] == [
        "raw", "after_exact_dedup", "after_quality_filter",
        "after_source_cap",
    ]
    assert out[1]["n_docs"] == 3
    assert out[2]["n_docs"] == 2           # dup removed
    assert out[3]["n_docs"] == 1           # digit soup filtered
    for i in (2, 3, 4):
        assert out[i]["n_docs"] <= out[i - 1]["n_docs"]
        assert out[i]["n_tokens"] <= out[i - 1]["n_tokens"]


def test_yield_report_source_cap_binds(spark, tmp_path):
    from transformers_spark.expansion6 import (
        YIELD_SOURCE_CAP, q_curation_yield_report,
    )

    good = ("the and for with that this from have more some very much "
            "good time " * 2)
    rows = [(i, good + f"tail{i}", "en", "s", len(good) + 6)
            for i in range(YIELD_SOURCE_CAP + 5)]
    sf = str(tmp_path / "sfcap")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["stage_ord"]: r for r in q_curation_yield_report(spark, sf).collect()}
    assert out[3]["n_docs"] == YIELD_SOURCE_CAP + 5
    assert out[4]["n_docs"] == YIELD_SOURCE_CAP


def test_char_bigram_diversity_counts(spark, tmp_path):
    """'abab' -> 3 bigrams (ab, ba, ab): total 3, distinct 2, top
    share 2/3, simpson (4+1)/9. Sub-2-char docs contribute nothing
    (the Spark descending-sequence guard)."""
    from transformers_spark.expansion6 import q_text_char_bigram_diversity

    rows = [
        (0, "abab", "en", "s", 4),
        (1, "x", "en", "s", 1),       # 1 normalized char -> no bigrams
        (2, "   ", "de", "s", 3),     # normalizes to '' -> no row at all
    ]
    sf = str(tmp_path / "sfbg")
    _write(_docs(spark, rows), sf, "documents")
    out = {r["lang"]: r for r in q_text_char_bigram_diversity(spark, sf).collect()}
    assert set(out) == {"en"}
    r = out["en"]
    assert r["n_bigrams"] == 3 and r["n_distinct"] == 2
    assert r["top_gram_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["simpson"] == pytest.approx(5 / 9, abs=1e-6)


def test_scurve_band_monotonicity(spark, tmp_path):
    """More bands (fewer rows per band) can only ADD candidate pairs:
    a pair matching on a full 8-row band at bands=2 also matches both
    constituent 4-row bands at bands=4, and so on. Assert n_pairs is
    monotone nondecreasing in bands, and the identical-doc pair agrees
    on every band at every config (avg agreement 1.0 when the only
    pair is an exact dup)."""
    from transformers_spark.expansion6 import q_lsh_scurve_calibration

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, text, "en", "s", len(text)),
        (1, text, "en", "s", len(text)),  # exact dup -> all bands agree
        (2, "totally unrelated words only here now", "en", "s", 38),
    ]
    sf = str(tmp_path / "sfsc")
    _write(_docs(spark, rows), sf, "documents")
    out = sorted(
        q_lsh_scurve_calibration(spark, sf).collect(),
        key=lambda r: r["bands"],
    )
    assert [r["bands"] for r in out] == [2, 4, 8]
    pairs = [r["n_pairs"] for r in out]
    assert pairs == sorted(pairs), pairs
    for r in out:
        assert r["rows_per_band"] * r["bands"] == 16
        if r["n_pairs"] == 1:
            assert r["avg_band_agreement"] == pytest.approx(1.0)


def test_scurve_empty_input_keeps_config_rows(spark, tmp_path):
    from transformers_spark.expansion6 import q_lsh_scurve_calibration

    sf = str(tmp_path / "sfsce")
    _write(_docs(spark, []), sf, "documents")
    out = sorted(
        q_lsh_scurve_calibration(spark, sf).collect(),
        key=lambda r: r["bands"],
    )
    assert [r["bands"] for r in out] == [2, 4, 8]
    assert all(r["n_pairs"] == 0 for r in out)
    assert all(r["avg_band_agreement"] is None for r in out)
