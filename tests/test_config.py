"""Config parsing tests (reference: executor/tests/test_config.py)."""

import pytest

from transformers_spark.config import (
    LoadMethod,
    TaskConfig,
    parse_labels,
    task_config_from_env,
    task_config_from_properties,
)

PROPERTIES = """
[DESTINATION]
PROJECT="playground"
DATASET="dev"
TABLE="counts"

[TRANSFORMATION]
WINDOW_SIZE="24h"
WINDOW_OFFSET=""
WINDOW_TRUNCATE_UPTO="d"
TIMEZONE="Asia/Jakarta"

[LOAD]
LOAD_METHOD="REPLACE"
"""


def test_properties_parsing():
    cfg = task_config_from_properties(PROPERTIES)
    assert cfg.destination_table == "playground.dev.counts"
    assert cfg.load_method is LoadMethod.REPLACE
    assert cfg.window_size == "24h"
    assert cfg.window_truncate_upto == "d"
    assert cfg.timezone == "Asia/Jakarta"
    assert cfg.concurrency == 1
    assert cfg.filter_expression is None


def test_env_parsing(monkeypatch):
    monkeypatch.setenv("PROJECT", "p")
    monkeypatch.setenv("DATASET", "d")
    monkeypatch.setenv("TABLE", "t")
    monkeypatch.setenv("LOAD_METHOD", "APPEND")
    monkeypatch.setenv("CONCURRENCY", "4")
    monkeypatch.setenv("PARTITION_FILTER", "date(x) >= '2020-01-01'")
    cfg = task_config_from_env()
    assert cfg.destination_table == "p.d.t"
    assert cfg.load_method is LoadMethod.APPEND
    assert cfg.concurrency == 4
    assert cfg.filter_expression == "date(x) >= '2020-01-01'"


def test_missing_required_env_raises(monkeypatch):
    monkeypatch.delenv("PROJECT", raising=False)
    with pytest.raises(AssertionError):
        task_config_from_env()


def test_invalid_timezone_rejected():
    with pytest.raises(Exception):
        TaskConfig("p", "d", "t", LoadMethod.APPEND, timezone="Not/AZone")


def test_zero_concurrency_rejected():
    with pytest.raises(ValueError):
        TaskConfig("p", "d", "t", LoadMethod.APPEND, concurrency=0)


def test_zero_window_size_rejected():
    with pytest.raises(ValueError):
        TaskConfig("p", "d", "t", LoadMethod.REPLACE, window_size="0")


def test_label_parsing():
    assert parse_labels("a=b,c=d") == {"a": "b", "c": "d"}
    with pytest.raises(ValueError):
        parse_labels("a=")


def test_write_mode_mapping():
    assert LoadMethod.APPEND.write_mode == "append"
    assert LoadMethod.REPLACE.write_mode == "overwrite"
    with pytest.raises(ValueError):
        LoadMethod.MERGE.write_mode
