"""Opt-in protobuf shim (gated by SPARK_GRAFT_PB_SHIM=1): the container
has no installed google.protobuf, but the Cloud SDK ships a pure-Python
runtime 6.32.0 while pyspark's generated StateMessage gencode is 6.33.0
— one minor newer, which the runtime validator hard-rejects despite the
cross-version guarantee covering it in practice. This sitecustomize
(imported automatically by every Python process on the PYTHONPATH,
including Spark's forked workers) relaxes ONLY that validator, and only
when the shim is explicitly enabled. Remove when a real protobuf wheel
is available."""
import os

if os.environ.get("SPARK_GRAFT_PB_SHIM") == "1":
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
