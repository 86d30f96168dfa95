"""Fallback ``google`` package: routes ``google.protobuf`` to a pure-python
protobuf runtime vendored elsewhere on the machine (located via the
``SPARK_GRAFT_PROTOBUF_DIR`` env var — set by
``kinesis_writer_spark.compat.protobuf_fallback.ensure_protobuf``, which only
engages this shim when ``google.protobuf`` is not natively installed).

Spark's ``transformWithStateInPandas`` generated code (gencode 6.33) refuses
runtimes one minor version older, so the version validator is no-opped —
acceptable for the minor-version skew this shim targets; a genuinely
incompatible runtime would still fail loudly at descriptor-parse time.

This file is importable by Spark *worker* processes via PYTHONPATH, which is
why the shim is an on-disk package rather than driver-side sys.modules
surgery.
"""

import os as _os

_real = _os.environ.get("SPARK_GRAFT_PROTOBUF_DIR")
if _real and _os.path.isdir(_os.path.join(_real, "protobuf")):
    __path__ = [_real]
    from google.protobuf import runtime_version as _rv  # noqa: E402

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
