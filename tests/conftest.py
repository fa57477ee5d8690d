from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Order-dependence guard (r14): pyspark.errors.utils._capture_call_site
# lazily imports IPython -> jedi on the first captured call site, and
# jedi calls sys.setrecursionlimit(3000) at import time. If that first
# happens INSIDE a @given example, hypothesis's ensure_free_stackframes
# sees the mid-test limit change and raises HypothesisWarning — an
# error under this repo's warnings-as-errors policy — so a module run
# alone (pytest tests/test_properties.py) failed while the full suite
# (where an earlier test had already triggered the import) passed.
# Trigger the one-time import before any test body runs.
try:  # pragma: no cover - absence of IPython is equally fine
    import IPython.core.completer  # noqa: F401
except ImportError:
    pass

from data_iceberg_sandbox_spark.session import get_spark_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark_session(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def scratch(tmp_path_factory):
    return str(tmp_path_factory.mktemp("lake"))
