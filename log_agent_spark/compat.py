"""Environment-compat shims.

``ensure_protobuf()``: the ``transformWithStateInPandas`` runner speaks
protobuf to the JVM state server, so ``google.protobuf`` must be
importable both in the driver and in every Spark Python worker. This
build container has no pip-installed protobuf and no network, but it does
ship a pure-Python protobuf runtime inside the Cloud SDK's bundled App
Engine platform. When the normal import fails we fall back to that copy:

  * driver side — insert the fallback dir on ``sys.path`` and relax the
    gencode/runtime version gate (runtime 6.32-dev vs gencode 6.33 — a
    minor-version delta with full wire compatibility for the standard
    features the StateMessage proto uses);
  * worker side — prepend ``tools/tws_pythonpath`` (which carries a
    ``sitecustomize.py`` doing the same two steps at interpreter startup)
    plus the fallback dir to ``PYTHONPATH`` *before* the SparkSession is
    created, so spawned workers inherit it.

This is a test-environment shim: any real deployment has protobuf
installed and the fast path returns immediately.
"""

from __future__ import annotations

import os
import sys

_FALLBACK = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "tws_pythonpath",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True if protobuf is (now) usable, False if no runtime exists
    in this environment at all.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_FALLBACK, "google", "protobuf")):
        return False
    if _FALLBACK not in sys.path:
        sys.path.append(_FALLBACK)
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion = (
            lambda *a, **k: None
        )
        from google.protobuf import descriptor  # noqa: F401
    except Exception:
        return False
    # Workers spawned by the JVM inherit PYTHONPATH; must be set before
    # the SparkSession exists to take effect.
    parts = [_SHIM_DIR, _FALLBACK]
    existing = os.environ.get("PYTHONPATH")
    if existing:
        parts.append(existing)
    os.environ["PYTHONPATH"] = os.pathsep.join(
        dict.fromkeys(p for p in parts if p)
    )
    return True
