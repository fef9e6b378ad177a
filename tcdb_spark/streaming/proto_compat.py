"""Activation for the vendored protobuf wire-format shim.

pyspark's ``transformWithStateInPandas`` drives its Python<->JVM state
server through protoc-generated classes
(pyspark/sql/streaming/proto/StateMessage_pb2.py), which need the
``google.protobuf`` runtime.  This image ships no protobuf and has no
package-index egress (DEVNOTES #52), so a minimal pure-stdlib runtime
is vendored under ``tcdb_spark/_vendor/protobuf_shim`` — just enough
for generated pb2 modules to execute unmodified (see
_vendor/protobuf_shim/google/protobuf/_shim_wire.py).

``ensure_protobuf()`` is called by ``tcdb_spark.session.get_spark``
BEFORE the JVM launches: the vendor dir must be on the driver's
``sys.path`` AND in ``PYTHONPATH`` at JVM-spawn time, because local-mode
Python workers inherit the JVM process environment — the state-server
client runs worker-side, where only PYTHONPATH reaches.

With a real protobuf installed this is a no-op ("native"); the shim
never shadows it.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_vendor",
    "protobuf_shim",
)


def ensure_protobuf(set_worker_env: bool = True) -> str:
    """Make ``google.protobuf`` importable, preferring the real package.

    Returns "native" (real protobuf present), "shim" (vendor activated),
    or "absent" (activation failed — should not happen in a checkout).
    """
    try:
        import google.protobuf  # noqa: F401

        return "native"
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return "absent"
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    # a bare `google` namespace package may already be imported (other
    # google.* dists) with a __path__ computed before our sys.path edit;
    # regular packages need the vendor subdir appended explicitly
    g = sys.modules.get("google")
    if g is not None:
        vendor_google = os.path.join(VENDOR_DIR, "google")
        paths = list(getattr(g, "__path__", []))
        if vendor_google not in paths:
            try:
                g.__path__.append(vendor_google)
            except AttributeError:
                pass
    if set_worker_env:
        existing = os.environ.get("PYTHONPATH", "")
        parts = existing.split(os.pathsep) if existing else []
        if VENDOR_DIR not in parts:
            os.environ["PYTHONPATH"] = (
                VENDOR_DIR + (os.pathsep + existing if existing else "")
            )
    try:
        import google.protobuf  # noqa: F401

        return "shim"
    except ImportError:
        return "absent"
