"""Round-10 expansion: cross-document substring dedup — semantics of
the removal rule (strictly cross-doc, canonical keeper survives) and
consistency between the rollup (stats) and rewrite forms. The
DuckDB-oracle equivalence of the catalog query itself is covered by
test_queries_oracle.py's parametrization."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from transformers_spark.operators.text import (
    cross_doc_span_dedup,
    cross_doc_span_dedup_stats,
    remove_long_dup_substrings,
    sliding_span_dup_profile,
)

# 8-word boilerplate shared by docs 1 and 3; doc 2 repeats its own
# 8-word chorus twice (within-doc only — must NOT be removed); doc 4
# is short (tail tile < span_len); doc 5 is empty-ish.
BOILER = "all rights reserved contact us terms privacy policy"
CHORUS = "row row row your boat gently down the"
DOCS = [
    (1, f"{BOILER} unique alpha text one two three four five"),
    (2, f"{CHORUS} {CHORUS} stream merrily"),
    (3, f"{BOILER} different beta content six seven eight nine ten"),
    (4, "short tail doc"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_stats_removal_is_strictly_cross_document(spark, docs_df):
    rows = {
        r["doc"]: r
        for r in cross_doc_span_dedup_stats(docs_df, span_len=8).collect()
    }
    # BOILER is tile 0 of docs 1 and 3: keeper = (1, 0), so doc 1
    # keeps it and doc 3 loses exactly that tile (8 tokens).
    assert rows[1]["n_cross_dup_spans"] == 1
    assert rows[1]["n_removed_spans"] == 0
    assert rows[3]["n_removed_spans"] == 1
    assert rows[3]["tokens_removed"] == 8
    # doc 2's chorus repeats only WITHIN doc 2 — untouched.
    assert rows[2]["n_cross_dup_spans"] == 0
    assert rows[2]["n_removed_spans"] == 0
    assert rows[2]["retained_token_frac"] == 1.0
    # short doc: one tail tile of 3 tokens, nothing shared.
    assert rows[4]["n_spans"] == 1
    assert rows[4]["n_tokens"] == 3
    # empty text still tiles to one ''-token span (split semantics),
    # matching the oracle's len(ts) = 1 on ''.
    assert rows[5]["n_spans"] == 1


def test_rewrite_matches_stats_removal(spark, docs_df):
    texts = {
        r["doc_id"]: r["deduped_text"]
        for r in cross_doc_span_dedup(docs_df, span_len=8).collect()
    }
    # keeper doc unchanged; non-keeper doc loses the leading tile.
    assert texts[1] == DOCS[0][1]
    assert texts[3] == "different beta content six seven eight nine ten"
    # within-doc repeat preserved verbatim.
    assert texts[2] == DOCS[1][1]
    assert texts[4] == DOCS[3][1]


def test_rewrite_tokens_agree_with_stats(spark, docs_df):
    """Retained token counts derived from the rewritten text equal the
    stats rollup's n_tokens - tokens_removed for every doc."""
    stats = {
        r["doc"]: r
        for r in cross_doc_span_dedup_stats(docs_df, span_len=8).collect()
    }
    texts = {
        r["doc_id"]: r["deduped_text"]
        for r in cross_doc_span_dedup(docs_df, span_len=8).collect()
    }
    for doc_id, txt in texts.items():
        s = stats[doc_id]
        # split('') -> [''] counts 1, same as the tiling convention
        n_kept = len(txt.split(" ")) if txt != "" or s["n_tokens"] else 0
        if txt == "" and s["n_tokens"] == 1:
            n_kept = 1  # the ''-token span survives as empty text
        assert n_kept == s["n_tokens"] - s["tokens_removed"], doc_id


SHARED12 = " ".join(f"s{i}" for i in range(12))


def test_sliding_profile_catches_offset_shifted_repeats(spark):
    """The case tiling misses by construction: the same 12-token
    substring at DIFFERENT offsets in two docs. Sliding windows flag
    5 consecutive positions in each (12 - 8 + 1) -> max run 5 ->
    longest duplicated span 12 tokens. A within-doc-only repeat stays
    unflagged, and a sub-8-token doc produces no row."""
    docs = [
        (1, f"{SHARED12} ua ub uc"),
        (2, f"vx vy {SHARED12}"),
        (3, "r1 r2 r3 r4 r5 r6 r7 r8 z r1 r2 r3 r4 r5 r6 r7 r8"),
        (4, "short one two"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r["doc"]: r for r in sliding_span_dup_profile(df).collect()
    }
    assert rows[1]["n_positions"] == 8  # 15 tokens -> 8 windows
    assert rows[1]["n_dup_positions"] == 5
    assert rows[1]["max_dup_run"] == 5
    assert rows[1]["longest_dup_span_tokens"] == 12
    assert rows[2]["n_dup_positions"] == 5
    assert rows[2]["longest_dup_span_tokens"] == 12
    # chorus repeated within doc 3 only -> strictly-cross-doc rule
    assert rows[3]["n_dup_positions"] == 0
    assert rows[3]["max_dup_run"] == 0
    assert rows[3]["longest_dup_span_tokens"] == 0
    assert 4 not in rows  # no 8-token window


def test_sliding_profile_vs_tiled_blindspot(spark):
    """The same corpus through the TILED stats shows zero cross-doc
    dup spans (offset shift lands the repeat in different tiles with
    different neighbors) while the sliding profile sees it — the
    documented trade, now pinned as a test."""
    docs = [
        (1, f"{SHARED12} ua ub uc w1"),
        (2, f"vx vy {SHARED12} w2 w3"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    tiled = {
        r["doc"]: r["n_cross_dup_spans"]
        for r in cross_doc_span_dedup_stats(df, span_len=8).collect()
    }
    assert tiled == {1: 0, 2: 0}
    sliding = {
        r["doc"]: r["n_dup_positions"]
        for r in sliding_span_dup_profile(df, span_len=8).collect()
    }
    assert sliding[1] > 0 and sliding[2] > 0


def test_remove_long_dup_substrings_threshold(spark):
    """The N-token removal policy: a 12-token cross-doc substring is
    removed from BOTH docs at min_run_tokens=12 (remove-all policy),
    kept everywhere at min_run_tokens=13, and within-doc repeats and
    short docs are untouched at any threshold."""
    docs = [
        (1, f"{SHARED12} ua ub uc"),
        (2, f"vx vy {SHARED12}"),
        (3, "r1 r2 r3 r4 r5 r6 r7 r8 z r1 r2 r3 r4 r5 r6 r7 r8"),
        (4, "short one two"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out12 = {
        r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
        for r in remove_long_dup_substrings(
            df, span_len=8, min_run_tokens=12
        ).collect()
    }
    assert out12[1] == ("ua ub uc", 12)
    assert out12[2] == ("vx vy", 12)
    assert out12[3] == (docs[2][1], 0)
    assert out12[4] == (docs[3][1], 0)
    out13 = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in remove_long_dup_substrings(
            df, span_len=8, min_run_tokens=13
        ).collect()
    }
    assert out13 == {1: 0, 2: 0, 3: 0, 4: 0}


def test_fast_hasher_matches_portable(spark, docs_df):
    """The production xxhash64 path (hasher='fast', r11) must produce
    the identical removal decisions as the oracle-portable md5 path —
    a 64-bit collision at this corpus size is astronomically unlikely,
    so ANY divergence is a threading bug in the hasher parameter, not
    chance. kept_fingerprint embeds the hash value itself and is
    excluded; every decision-derived column must match."""
    from transformers_spark.operators.text import (
        cross_doc_span_dedup_stats as stats,
    )
    from transformers_spark.operators.text import span_dedup_stats

    for fn, kw, cols in [
        (remove_long_dup_substrings, {"min_run_tokens": 12}, None),
        (sliding_span_dup_profile, {}, None),
        (cross_doc_span_dedup, {}, None),
        (stats, {}, ["doc", "n_spans", "n_cross_dup_spans",
                     "n_removed_spans", "tokens_removed"]),
        (span_dedup_stats, {}, None),
    ]:
        a = fn(docs_df, span_len=8, hasher="portable", **kw)
        b = fn(docs_df, span_len=8, hasher="fast", **kw)
        if cols:
            a, b = a.select(cols), b.select(cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown hasher"):
        remove_long_dup_substrings(docs_df, hasher="bogus").collect()


def _ref_remove_long_dups(
    texts: list[str], k: int, min_run: int
) -> dict[int, tuple[str, int]]:
    """Independent Python reference: sliding cross-doc window flags ->
    maximal runs -> token spans >= min_run removed (all occurrences)."""
    wins: dict[tuple, set[int]] = {}
    doc_wins: dict[int, list[tuple]] = {}
    for d, text in enumerate(texts):
        toks = text.strip().split() if text.strip() else [""]
        ws = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        doc_wins[d] = ws
        for w in ws:
            wins.setdefault(w, set()).add(d)
    out = {}
    for d, text in enumerate(texts):
        toks = text.strip().split() if text.strip() else [""]
        dup_pos = [
            i for i, w in enumerate(doc_wins[d]) if len(wins[w]) >= 2
        ]
        removed = set()
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p != run[-1] + 1):
                span = run[-1] + k - run[0]
                if span >= min_run:
                    removed.update(range(run[0], run[-1] + k))
                run = []
            if p is not None:
                run.append(p)
        kept = [t for i, t in enumerate(toks) if i not in removed]
        out[d] = (" ".join(kept), len(removed))
    return out


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    min_run=st.integers(min_value=2, max_value=5),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_remove_long_dup_substrings(spark, texts, min_run):
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    expected = _ref_remove_long_dups(texts, 2, min_run)
    # both hash paths (portable md5 / fast xxhash64) must reproduce
    # the independent reference — not merely agree with each other
    for hasher in ("portable", "fast"):
        got = {
            r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
            for r in remove_long_dup_substrings(
                df, span_len=2, min_run_tokens=min_run, hasher=hasher
            ).collect()
        }
        assert got == expected, hasher


# --- property fuzz: random corpora from a tiny vocabulary (maximizes
# span collisions), short span_len so multi-tile docs are common -----

_doc_text = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=9
).map(" ".join)


def _tiles(text: str, k: int) -> list[tuple[str, ...]]:
    """Python twin of the operator's tiling: whitespace split after
    trim ('' tokenizes to the single '' token), stride = span_len."""
    toks = text.strip().split() if text.strip() else [""]
    return [tuple(toks[i : i + k]) for i in range(0, len(toks), k)]


def _expected_rewrite(texts: list[str], k: int) -> dict[int, str]:
    """Independent reference implementation of the removal rule."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, text in enumerate(texts):
        for i, t in enumerate(_tiles(text, k)):
            occ.setdefault(t, []).append((d, i))
    out: dict[int, str] = {}
    for d, text in enumerate(texts):
        kept = []
        for i, t in enumerate(_tiles(text, k)):
            cross_doc = len({dd for dd, _ in occ[t]}) >= 2
            if cross_doc and (d, i) != min(occ[t]):
                continue
            kept.append(" ".join(t))
        out[d] = " ".join(kept)
    return out


@given(texts=st.lists(_doc_text, min_size=1, max_size=7))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_rewrite_consistent_with_stats(spark, texts):
    """For random tiny-vocab corpora (maximal span collisions): the
    rewrite equals an independent Python reference of the removal
    rule, token accounting agrees with the rollup, and the rollup
    fingerprint is deterministic across re-runs."""
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    k = 2
    stats = {
        r["doc"]: r.asDict()
        for r in cross_doc_span_dedup_stats(df, span_len=k).collect()
    }
    texts_out = {
        r["doc_id"]: r["deduped_text"]
        for r in cross_doc_span_dedup(df, span_len=k).collect()
    }
    assert texts_out == _expected_rewrite(texts, k)
    # token accounting (unambiguous only for non-empty rewrites: ''
    # can be either zero kept tiles or one kept ''-token tile, and
    # the full-content equality above already distinguishes them)
    for doc_id, txt in texts_out.items():
        if txt:
            s = stats[doc_id]
            assert (
                len(txt.split(" ")) == s["n_tokens"] - s["tokens_removed"]
            ), (doc_id, txt, s)
    rerun = {
        r["doc"]: r["kept_fingerprint"]
        for r in cross_doc_span_dedup_stats(df, span_len=k).collect()
    }
    assert rerun == {
        d: s["kept_fingerprint"] for d, s in stats.items()
    }


# --- DuckDB oracle for the REWRITE form (r11): the rewrite is a
# library operator, not a catalog query (catalog slots are capped),
# so its cross-engine oracle lives here — same discipline as the
# catalog gate: mirror the operator stage by stage in DuckDB SQL and
# compare full output on the real sf0.001 corpus. ---------------------

_ORACLE_REWRITE = """
WITH toks AS (
  SELECT doc_id, {DT} AS ts FROM documents
),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS span_idx,
         array_to_string(list_slice(ts, i*8 + 1, i*8 + 8), ' ') AS tile
  FROM toks,
       unnest(generate_series(0, CAST(ceil(len(ts) / 8.0) AS INT) - 1)) AS g(i)
  WHERE len(ts) > 0
),
hashed AS (
  SELECT doc_id, span_idx, tile, md5(tile) AS span_h FROM spans
),
dup AS (
  SELECT span_h, min({{'doc': doc_id, 'idx': span_idx}}) AS keeper
  FROM hashed GROUP BY span_h
  HAVING COUNT(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT h.doc_id, string_agg(h.tile, ' ' ORDER BY h.span_idx) AS t
  FROM hashed h LEFT JOIN dup d ON h.span_h = d.span_h
  WHERE d.span_h IS NULL
     OR (d.keeper.doc = h.doc_id AND d.keeper.idx = h.span_idx)
  GROUP BY h.doc_id
)
SELECT doc_id, COALESCE(k.t, '') AS deduped_text
FROM documents LEFT JOIN kept k USING (doc_id)
"""


def test_rewrite_matches_duckdb_oracle(spark):
    """cross_doc_span_dedup vs an independent DuckDB implementation
    on the real sf0.001 documents corpus: every doc's rewritten text
    must match byte-for-byte (a doc whose every tile is removed —
    zero rows in the kept aggregate — must coalesce to '', exactly
    like Spark's array_join over the empty kept-tile array)."""
    import duckdb

    from transformers_spark.operators.specs import DUCK_TOKENS

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r["doc_id"]: r["deduped_text"]
        for r in cross_doc_span_dedup(docs, span_len=8).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = dict(con.execute(_ORACLE_REWRITE.format(DT=DUCK_TOKENS)).fetchall())
    assert len(got) == len(exp)
    assert got == exp
