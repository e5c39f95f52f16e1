#!/usr/bin/env python
"""Null-robustness gate: the catalog vs its oracles on null-bearing data.

The driver's testdata contains no NULLs, so a whole class of
Spark-vs-DuckDB divergence (size(split(NULL)) = -1, count(*) vs
null-skipping COUNT(col), hashing NULL into a sketch, ...) is
invisible to the regular gate. This tool copies sf0.001 with ~2% NULLs
injected into the nullable VALUE columns of the LLM-pipeline tables
(events.user_id/event_type/value/props, documents.text/lang/source,
embeddings.label — ids, timestamps and vectors stay non-null) and runs
the same dual-engine compare over every catalog query.

A mismatch here is a real portability bug: the two engines disagree on
the same input. A loud ERROR can be a contract (operators like
ntiles_wide reject null keys by design) — those are reported
separately for eyeball triage, not auto-failed.

    python tools/null_gate.py                # build + run all
    python tools/null_gate.py --only NAME    # one query
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scratch

SRC = "/root/testdata/sf0.001"
DST = scratch.scratch_path("nulldata_sf0.001")

# table -> columns to null-inject (deterministic ~2% by id-hash)
INJECT = {
    "events": ["user_id", "event_type", "value", "props"],
    "documents": ["text", "lang", "source"],
    "embeddings": ["label"],
}
# wave 2: event-time and embedding-vector nulls — these exercise
# window ORDER BY (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST),
# temporal joins, and vector arithmetic, so they are gated separately
INJECT_WAVE2 = {
    "events": ["ts"],
    "embeddings": ["embedding"],
}
# wave 3: the TPC-H side. FK columns (o_custkey, l_partkey, l_suppkey,
# c_nationkey, s_nationkey) are the interesting ones — NOT IN with a
# NULL-bearing subquery must yield the empty set in BOTH engines, and a
# Spark plan that compiled NOT IN to a plain left-anti join would
# diverge here. Value columns exercise null-skipping aggregates and
# NULL group keys. Date/timestamp columns stay non-null: the engine's
# time-null contract was established in wave 2 (event-time operators
# drop NULL event times) and TPC-H dates are PK-like generator outputs.
INJECT_WAVE3 = {
    "customer": ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    "lineitem": [
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    ],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "supplier": ["s_name", "s_nationkey", "s_acctbal"],
}
# table -> key EXPRESSION used to derive the deterministic inject hash
# (lineitem's key is composite, so it hashes a fused expression)
KEY = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": "(l_orderkey * 8 + l_linenumber)",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "region": "r_regionkey",
    "nation": "n_nationkey",
}


def build_degenerate_text(dst_dir: str) -> None:
    """documents.text variant: ~2% each of empty string, whitespace-only
    and single-token text (n_chars kept consistent). A DISTINCT
    divergence class from NULL injection: split('') yields [''] (one
    empty token), not [] — tokenizer-adjacent operators that conflate
    the two diverge here, not in the null waves."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(SRC, fname)
        dst = os.path.join(dst_dir, fname)
        if fname != "documents.parquet":
            shutil.copyfile(src, dst)
            continue
        duckdb.sql(f"""
COPY (
  SELECT doc_id,
         CASE WHEN hash(doc_id) % 50 = 0 THEN ''
              WHEN hash(doc_id) % 50 = 1 THEN '   '
              WHEN hash(doc_id) % 50 = 2 THEN 'single'
              -- exotic-whitespace case: vertical tab + form feed, the
              -- Java-\s-vs-RE2-\s divergence probe (ORACLES.md class 16)
              WHEN hash(doc_id) % 50 = 3 THEN 'a' || chr(11) || 'b' || chr(12) || 'c'
              ELSE text END AS text,
         lang, source,
         CASE WHEN hash(doc_id) % 50 IN (0, 1, 2, 3) THEN length(
           CASE WHEN hash(doc_id) % 50 = 0 THEN ''
                WHEN hash(doc_id) % 50 = 1 THEN '   '
                WHEN hash(doc_id) % 50 = 3 THEN 'a' || chr(11) || 'b' || chr(12) || 'c'
                ELSE 'single' END) ELSE n_chars END AS n_chars
  FROM read_parquet('{src}')
) TO '{dst}' (FORMAT PARQUET)""")
    print(f"built {dst_dir} (degenerate text)", file=sys.stderr)


def build_unicode_text(dst_dir: str) -> None:
    """documents.text variant: ~10% accented / CJK / emoji / RTL /
    Turkish-İ strings. Case folding is the divergence class: Java/ICU
    full folding (Spark) maps U+0130 to 'i' + U+0307 while DuckDB's
    simple folding gives bare 'i' — oracles pre-replace İ to state the
    Spark contract (found by this gate in round 5)."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    variants = [
        "Éléphant CAFÉ Straße ärger ÜBER naïve",
        "数据 处理 引擎 スパーク データ 処理",
        "emoji 🚀 test 🎉 mixed ascii 🚀 tokens",
        "مرحبا بالعالم نص عربي تجريبي هنا",
        "Türkçe İstanbul ışık DOTTED İİ test",
    ]
    cases = " ".join(
        f"WHEN hash(doc_id) %% 50 = {i} THEN '{v}'" for i, v in enumerate(variants)
    ).replace("%%", "%")
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(SRC, fname)
        dst = os.path.join(dst_dir, fname)
        if fname != "documents.parquet":
            shutil.copyfile(src, dst)
            continue
        duckdb.sql(f"""
COPY (
  SELECT doc_id,
         CASE {cases} ELSE text END AS text,
         lang, source,
         length(CASE {cases} ELSE text END) AS n_chars
  FROM read_parquet('{src}')
) TO '{dst}' (FORMAT PARQUET)""")
    print(f"built {dst_dir} (unicode text)", file=sys.stderr)


def build_extreme_values(dst_dir: str) -> None:
    """events.value variant: ~6% extreme doubles (±1e308, 1e-308).
    Divergence class: with ANSI off, Spark CAST(1e308 AS DECIMAL(p,s))
    yields NULL; DuckDB CAST raises a conversion error (TRY_CAST is
    the lenient twin). This wave MEASURES which oracles still assume
    plain CAST — a red row here is an oracle-portability finding, not
    an engine bug."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(SRC, fname)
        dst = os.path.join(dst_dir, fname)
        if fname != "events.parquet":
            shutil.copyfile(src, dst)
            continue
        duckdb.sql(f"""
COPY (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN hash(event_id) % 50 = 0 THEN 1e308
              WHEN hash(event_id) % 50 = 1 THEN -1e308
              WHEN hash(event_id) % 50 = 2 THEN 1e-308
              ELSE value END AS value,
         props
  FROM read_parquet('{src}')
) TO '{dst}' (FORMAT PARQUET)""")
    print(f"built {dst_dir} (extreme values)", file=sys.stderr)


def build_malformed_json(dst_dir: str) -> None:
    """events.props variant: ~8% malformed JSON ('{', '', 'not json',
    '[1,2'). Spark's get_json_object is LENIENT (NULL on malformed);
    DuckDB's json_extract_string ERRORS — oracles must guard with
    json_valid to state the lenient engine contract."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        src = os.path.join(SRC, fname)
        dst = os.path.join(dst_dir, fname)
        if fname != "events.parquet":
            shutil.copyfile(src, dst)
            continue
        duckdb.sql(f"""
COPY (
  SELECT event_id, user_id, event_type, ts, value,
         CASE WHEN hash(event_id) % 50 = 0 THEN '{{'
              WHEN hash(event_id) % 50 = 1 THEN ''
              WHEN hash(event_id) % 50 = 2 THEN 'not json'
              WHEN hash(event_id) % 50 = 3 THEN '[1,2'
              ELSE props END AS props
  FROM read_parquet('{src}')
) TO '{dst}' (FORMAT PARQUET)""")
    print(f"built {dst_dir} (malformed json)", file=sys.stderr)


def build_duplicate_rows(dst_dir: str, src_dir: str = SRC) -> None:
    """EVERY table gets ~1% exact duplicate rows (ids included) via a
    deterministic hash-sample UNION ALL. Divergence class: the oracle
    determinism convention breaks ties on id columns (event_id, doc_id,
    ...) — with non-unique ids those ties become nondeterministic in
    BOTH engines unless the tied rows are bit-identical (they are, by
    construction here) or the query reduces them (DISTINCT / aggregate).
    A red row here means a query's output ORDER or slice depends on
    which physical duplicate won — a real contract hole.

    ``src_dir`` lets the wave COMPOSE: pointing it at a null-injected
    copy duplicates null-BEARING rows (ids included), probing the
    dup×null interaction (NULL group keys duplicated, eqNullSafe
    partitions with physical copies, NULL-id tie-breaks)."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        src = os.path.join(src_dir, fname)
        dst = os.path.join(dst_dir, fname)
        key = KEY[table]
        # tiny dimensions (region 5 / nation 25 rows) would rarely hit a
        # 1% sample — duplicate every ~4th row there so the wave
        # actually exercises duplicated dimension keys
        mod = 100 if table not in ("region", "nation") else 4
        duckdb.sql(f"""
COPY (
  SELECT * FROM read_parquet('{src}')
  UNION ALL
  SELECT * FROM read_parquet('{src}') WHERE hash({key}) % {mod} = 0
) TO '{dst}' (FORMAT PARQUET)""")
    print(f"built {dst_dir} (duplicate rows)", file=sys.stderr)


def build_nulldata(inject: dict | None = None, dst_dir: str | None = None) -> None:
    import duckdb

    inject = inject if inject is not None else INJECT
    dst_dir = dst_dir or DST
    os.makedirs(dst_dir, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        src = os.path.join(SRC, fname)
        dst = os.path.join(dst_dir, fname)
        if table not in inject:
            shutil.copyfile(src, dst)
            continue
        key = KEY[table]
        cols = duckdb.sql(f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
        exprs = []
        for cname, *_ in cols:
            if cname in inject[table]:
                # ~2% per column, decorrelated across columns by name
                exprs.append(
                    f"CASE WHEN hash({key} + hash('{cname}')) % 50 = 0 "
                    f"THEN NULL ELSE {cname} END AS {cname}"
                )
            else:
                exprs.append(cname)
        duckdb.sql(
            f"COPY (SELECT {', '.join(exprs)} FROM read_parquet('{src}')) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    print(f"built {dst_dir}", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--json", default=None,
                    help="also write a summary artifact to this path")
    ap.add_argument("--wave2", action="store_true",
                    help="ALSO null-inject events.ts and "
                         "embeddings.embedding (null ordering / vector "
                         "arithmetic paths) on top of the wave-1 columns")
    ap.add_argument("--wave3", action="store_true",
                    help="ALSO null-inject the TPC-H value + FK columns "
                         "(NOT IN / anti-join / null-group-key paths) on "
                         "top of the wave-1 columns")
    ap.add_argument("--degenerate-text", action="store_true",
                    help="INSTEAD of null injection, rewrite ~6%% of "
                         "documents.text to empty/whitespace-only/"
                         "single-token strings (split('') = [''] class)")
    ap.add_argument("--malformed-json", action="store_true",
                    help="INSTEAD of null injection, rewrite ~8%% of "
                         "events.props to malformed JSON (lenient-"
                         "extraction contract: NULL, never an error)")
    ap.add_argument("--unicode-text", action="store_true",
                    help="INSTEAD of null injection, rewrite ~10%% of "
                         "documents.text to accented/CJK/emoji/RTL/"
                         "Turkish-dotted-I strings (case-folding class)")
    ap.add_argument("--extreme-values", action="store_true",
                    help="INSTEAD of null injection, rewrite ~6%% of "
                         "events.value to ±1e308/1e-308 (decimal-cast "
                         "overflow: Spark NULL vs DuckDB CAST error)")
    ap.add_argument("--duplicate-rows", action="store_true",
                    help="INSTEAD of null injection, UNION ALL a ~1%% "
                         "exact-duplicate sample into EVERY table "
                         "(duplicated ids: the id-tiebreak determinism "
                         "class)")
    ap.add_argument("--dup-on-nulls", action="store_true",
                    help="COMPOSED wave: duplicate ~1%% of rows of the "
                         "combined all-columns NULL dataset (w2+w3) — "
                         "duplicated null-bearing rows probe the "
                         "dup x null interaction")
    args = ap.parse_args()

    if args.degenerate_text:
        # the string-content waves replace null injection entirely
        # (their own dataset + builder); wave flags are ignored
        dst = scratch.scratch_path("degentext_sf0.001")
        inject = {"documents": ["text (degenerate strings, not NULL)"]}
        if not args.skip_build:
            build_degenerate_text(dst)
    elif args.malformed_json:
        dst = scratch.scratch_path("badjson_sf0.001")
        inject = {"events": ["props (malformed JSON, not NULL)"]}
        if not args.skip_build:
            build_malformed_json(dst)
    elif args.unicode_text:
        dst = scratch.scratch_path("unicode_sf0.001")
        inject = {"documents": ["text (unicode case-folding class, not NULL)"]}
        if not args.skip_build:
            build_unicode_text(dst)
    elif args.extreme_values:
        dst = scratch.scratch_path("extreme_sf0.001")
        inject = {"events": ["value (extreme doubles, not NULL)"]}
        if not args.skip_build:
            build_extreme_values(dst)
    elif args.duplicate_rows:
        dst = scratch.scratch_path("duprows_sf0.001")
        inject = {"*": ["~1% exact duplicate rows, ids included"]}
        if not args.skip_build:
            build_duplicate_rows(dst)
    elif args.dup_on_nulls:
        dst = scratch.scratch_path("dupnulls_sf0.001")
        inject = {"*": ["~1% duplicates OF the w2+w3 null-injected rows"]}
        if not args.skip_build:
            base = DST + "-w2-w3"
            if not os.path.isdir(base):
                combined = {
                    t: sorted(
                        set(INJECT.get(t, []))
                        | set(INJECT_WAVE2.get(t, []))
                        | set(INJECT_WAVE3.get(t, []))
                    )
                    for t in set(INJECT) | set(INJECT_WAVE2) | set(INJECT_WAVE3)
                }
                build_nulldata(combined, base)
            build_duplicate_rows(dst, src_dir=base)
    else:
        dst = DST
        inject = dict(INJECT)
        if args.wave2:
            inject = {
                t: sorted(set(inject.get(t, [])) | set(INJECT_WAVE2.get(t, [])))
                for t in set(inject) | set(INJECT_WAVE2)
            }
        if args.wave3:
            inject = {
                t: sorted(set(inject.get(t, [])) | set(INJECT_WAVE3.get(t, [])))
                for t in set(inject) | set(INJECT_WAVE3)
            }
        # each flag COMBINATION gets its own dataset dir — the combined
        # wave must never overwrite a single wave's data, or a later
        # --skip-build run of that wave silently tests the wrong inject
        suffix = ("-w2" if args.wave2 else "") + ("-w3" if args.wave3 else "")
        dst = DST + suffix
        if not args.skip_build:
            build_nulldata(inject, dst)

    import __spark_entry__ as entry_mod
    from gatelib import compare_queries, summarize

    from transformers_spark.session import get_spark

    qs = entry_mod.queries()
    names = [args.only] if args.only else list(qs)

    spark = get_spark(app_name="null-robustness-gate")
    spark.sparkContext.setLogLevel("ERROR")

    results = compare_queries(spark, qs, names, dst)
    summ = summarize(results)

    print("\n=== NULL-GATE SUMMARY ===")
    print(
        f"checked: {summ['n_checked']}  mismatches: "
        f"{len(summ['mismatches'])}  errors: {len(summ['errors'])}"
    )
    for n in summ["mismatches"]:
        print("MISMATCH:", n)
    for n in summ["errors"]:
        print(f"--- ERROR {n} ---\n{results[n].get('traceback', '')}")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump({"data": dst, "inject": inject, **summ}, fh, indent=1)
        print(f"wrote {args.json}")
    spark.stop()


if __name__ == "__main__":
    main()
