"""The examples must actually run — they are the user-facing proof the
operator surface composes into a real pipeline."""


def test_curation_pipeline_example(tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "curation_pipeline",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "curation_pipeline.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.main("/root/testdata/sf0.001", str(tmp_path / "out"))
    assert 0 < stats["curated_docs"] <= stats["input_docs"]


def test_incremental_dedup_example():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "incremental_dedup",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "incremental_dedup.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.main("/root/testdata/sf0.001")
    assert stats["kept_after_dedup"] == stats["new_docs"] - stats["near_dups_vs_index"]
    assert stats["new_docs"] > 0


def test_boilerplate_strip_example(tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "boilerplate_strip",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "boilerplate_strip.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stats = mod.main("/root/testdata/sf0.001", str(tmp_path / "out"))
    # rewrite preserves every document row and never adds tokens
    assert stats["output_docs"] == stats["input_docs"]
    assert 0 <= stats["tokens_removed"] <= stats["total_tokens"]
