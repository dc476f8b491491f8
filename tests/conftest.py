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
    export is inherited by the tws state-server worker processes.

    The export goes through a SHIM directory holding only a
    ``google/protobuf`` symlink, never the SDK dir itself: ``google``
    is a PEP-420 namespace package and the SDK bundle also carries
    ``google.auth``/``google.oauth2``/``google.pyglib`` — putting the
    whole bundle ahead of site-packages would silently shadow any
    pip-installed versions of those in the workers while the driver
    (appended path) kept the pip ones, a driver/executor skew. The
    shim confines the fallback to exactly protobuf.

    The bundled runtime (6.32.0-dev) trails PySpark's gencode (6.33.0)
    by one minor, so protobuf's own documented escape hatch
    (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set alongside; the
    wire format is unchanged across that step and the parity test
    checks the full round-trip anyway. No-op when protobuf is already
    installed or the SDK bundle is absent (the test then skips as
    before)."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    bundle_pb = (
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    )
    if not os.path.isdir(bundle_pb):
        return
    shim = os.path.join(os.path.dirname(__file__), os.pardir, "_scratch", "pb_shim")
    shim = os.path.abspath(shim)
    os.makedirs(os.path.join(shim, "google"), exist_ok=True)
    link = os.path.join(shim, "google", "protobuf")
    # lexists, not exists: a dangling symlink (SDK bundle moved/removed
    # after a prior run) returns False from exists() and os.symlink then
    # raises FileExistsError at conftest import, aborting the whole test
    # session (ADVICE round 10). Remove a stale/dangling link first.
    if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(
        bundle_pb
    ):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(bundle_pb, link)
    sys.path.append(shim)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        sys.path.remove(shim)
        return
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ.get("PYTHONPATH", "")
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
