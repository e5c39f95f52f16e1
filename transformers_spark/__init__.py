"""transformers_spark — a PySpark-native windowed-SQL transformation
engine with the capabilities of raystack/transformers (bq2bq), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, partitioned
Parquet tables, and large-scale training-data-pipeline operators.
"""

from .config import LoadMethod, TaskConfig, task_config_from_env, task_config_from_properties
from .macros import render_macros
from .windowing import CustomWindow, Window, localise_datetime, parse_duration, window_for

__version__ = "0.1.0"

__all__ = [
    "LoadMethod",
    "TaskConfig",
    "task_config_from_env",
    "task_config_from_properties",
    "render_macros",
    "CustomWindow",
    "Window",
    "localise_datetime",
    "parse_duration",
    "window_for",
]
