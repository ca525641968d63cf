"""Smoke-test the runnable examples (the binding's test_examples.py
pattern, wingfoil-python/tests/test_examples.py): each must execute
clean — they assert their own outputs."""

import pathlib
import runpy

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.parametrize(
    "name",
    ["quick_start", "custom_stream_subclass", "dataframe", "llm_pipeline",
     "plugin_sdk", "vector_store", "incremental_index"],
)
def test_example_runs(spark, name):
    # the active session is reused by get_spark's getOrCreate, so the
    # examples run inside the test JVM rather than booting their own
    runpy.run_path(str(EXAMPLES / f"{name}.py"), run_name="__main__")
