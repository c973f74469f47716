"""Shared fixtures: one Spark session per test run; reference-module loader."""

from __future__ import annotations

import importlib.util
import logging
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE_PIPELINE = "/root/reference/scripts/unified_ocr_pipeline.py"


@pytest.fixture(scope="session")
def reference_pipeline():
    """The actual reference implementation, imported read-only, used as a
    differential oracle for the field kernels (parity gate, not a copy)."""
    os.environ.setdefault("LOG_DIR", "/tmp/ref_logs")
    spec = importlib.util.spec_from_file_location("ref_uop", REFERENCE_PIPELINE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    logging.disable(logging.CRITICAL)  # silence the reference's chatty logger
    pipe = mod.UnifiedOCRPipeline()
    yield pipe
    logging.disable(logging.NOTSET)


@pytest.fixture(scope="session")
def spark():
    from unified_ocr_pipeline_spark.plans.session import get_spark

    spark = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield spark
    spark.stop()
