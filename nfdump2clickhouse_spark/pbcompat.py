"""google.protobuf compatibility shim.

The container ships no protobuf wheel, but pyspark 4's
`transformWithStateInPandas` worker hard-requires `google.protobuf`
(its state-channel messages are protobuf-encoded). A pure-Python
protobuf runtime 6.32.0 happens to exist on this image inside the Cloud
SDK's bundled App Engine tree; pyspark's generated StateMessage gencode
is 6.33.0 — one minor NEWER, which the runtime's strict validator
rejects even though protobuf's cross-version guarantee covers a
one-minor gap in practice.

`ensure_protobuf()` makes the real TWS path runnable with zero
installs, all inside this repo:

1. if `google.protobuf` already imports (a real wheel), do nothing;
2. else, if the SDK runtime exists, append it to sys.path for the
   DRIVER, relax only the version validator, and export
   PYTHONPATH + SPARK_GRAFT_PB_SHIM so Python WORKERS forked by a
   JVM started *after* this call inherit the same setup (the
   `_pbshim/sitecustomize.py` applies the validator patch inside each
   worker at interpreter start);
3. on any failure, report False — callers fall back to the
   `applyInPandasWithState` implementation, which is the same operator
   semantics on the older API.

Remove this module when a real protobuf wheel is available.
"""

from __future__ import annotations

import os

_SDK_PB = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def ensure_protobuf() -> bool:
    """Best-effort: make `google.protobuf` importable (driver + future
    workers). Returns True when the TWS proto modules load."""
    try:
        import google.protobuf  # noqa: F401

        return _validate_gencode()
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SDK_PB, "google", "protobuf")):
        return False
    import sys

    if _SDK_PB not in sys.path:
        sys.path.append(_SDK_PB)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        return False
    # workers: sitecustomize on PYTHONPATH re-applies the patch per process
    os.environ["SPARK_GRAFT_PB_SHIM"] = "1"
    parts = [p for p in (_SHIM_DIR, _SDK_PB) if p]
    prev = os.environ.get("PYTHONPATH", "")
    for p in parts:
        if p not in prev.split(os.pathsep):
            prev = p + os.pathsep + prev if prev else p
    os.environ["PYTHONPATH"] = prev
    return _validate_gencode()


def _validate_gencode() -> bool:
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False
