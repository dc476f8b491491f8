from __future__ import annotations

import os
import sys

import pytest


def _enable_bundled_protobuf() -> None:
    """Make the transformWithState parity test runnable when the
    ``protobuf`` package is not pip-installed: the Google Cloud SDK
    ships the public (BSD-licensed) pure-Python protobuf runtime, and
    PySpark's state-v2 protocol only needs it importable in the driver
    and its spawned Python workers. Runs at conftest import — BEFORE
    the session-scoped SparkSession starts its JVM — so the PYTHONPATH
    export is inherited by the tws state-server worker processes. The
    bundled runtime (6.32.0-dev) trails PySpark's gencode (6.33.0) by
    one minor, so protobuf's own documented escape hatch
    (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set alongside;
    the wire format is unchanged across that step and the parity test
    checks the full round-trip anyway. No-op when protobuf is already
    installed or the SDK bundle is absent (the test then skips as
    before)."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    bundle = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(bundle, "google", "protobuf")):
        return
    sys.path.append(bundle)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        sys.path.remove(bundle)
        return
    os.environ["PYTHONPATH"] = (
        bundle + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_enable_bundled_protobuf()

from vector_database_watermarking_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF0001
