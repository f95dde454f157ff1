"""Interpreter-startup shim for Spark Python workers (see
log_agent_spark/compat.py). Placed on PYTHONPATH so every spawned worker
imports it automatically; makes the Cloud SDK's bundled pure-Python
protobuf importable and relaxes its gencode/runtime version gate so the
transformWithStateInPandas wire protocol works without a pip-installed
protobuf.

This dir only ever reaches PYTHONPATH when compat.ensure_protobuf() has
already established that no real protobuf is installed, so the version
gate we disable here belongs to the fallback runtime, never to a
properly-installed one.
"""

import os
import sys

_fb = "/usr/lib/google-cloud-sdk/platform/google_appengine"
if os.path.isdir(os.path.join(_fb, "google", "protobuf")):
    if _fb not in sys.path:
        sys.path.append(_fb)
    try:
        from google.protobuf import runtime_version

        # Only neutralize the gate when the resolved runtime IS the
        # bundled fallback (runtime 6.32-dev vs pyspark gencode 6.33 — a
        # wire-compatible minor delta).
        if runtime_version.__file__.startswith(_fb):
            runtime_version.ValidateProtobufRuntimeVersion = (
                lambda *a, **k: None
            )
    except Exception:
        pass
