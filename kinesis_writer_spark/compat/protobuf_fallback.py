"""Make ``google.protobuf`` importable when the package isn't installed.

``transformWithStateInPandas`` (the Spark 4 stateful-streaming API v2) talks
to the JVM state server through protobuf messages, so the Python worker needs
the ``google.protobuf`` runtime. Some images (including this one) don't ship
it, but DO carry a pure-python copy vendored inside other public tooling
(the Google Cloud SDK vendors protobuf 6.x under
``platform/google_appengine/google/protobuf``). :func:`ensure_protobuf`
engages that copy through the on-disk shim package in ``_proto_shim/``:

- driver side: prepends the shim dir to ``sys.path`` and exports
  ``SPARK_GRAFT_PROTOBUF_DIR`` so the shim knows where the real runtime is;
- worker side: prepends the shim dir to ``PYTHONPATH`` **before** the
  SparkSession exists, so locally-spawned python workers inherit it.

If ``google.protobuf`` is already installed, this is a no-op returning True.
If no vendored runtime can be found either, it returns False and callers
keep their graceful degradation (``TWS_AVAILABLE = False`` →
``applyInPandasWithState`` twin).
"""

from __future__ import annotations

import os
import sys

#: well-known public locations of a vendored pure-python protobuf runtime;
#: override/extend with $SPARK_GRAFT_PROTOBUF_DIR (a dir containing
#: ``protobuf/``, e.g. ``.../google_appengine/google``)
_VENDOR_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
]

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_proto_shim")


def ensure_protobuf() -> bool:
    """Best-effort: make ``import google.protobuf`` work here and in workers."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass

    candidates = [os.environ.get("SPARK_GRAFT_PROTOBUF_DIR")] + _VENDOR_CANDIDATES
    real = next(
        (c for c in candidates if c and os.path.isdir(os.path.join(c, "protobuf"))),
        None,
    )
    if real is None:
        return False

    os.environ["SPARK_GRAFT_PROTOBUF_DIR"] = real
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    # workers inherit the JVM's env; must run before the SparkSession is built
    pypath = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + pypath if pypath else "")
        )
    sys.modules.pop("google", None)  # a failed partial import must not linger
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
