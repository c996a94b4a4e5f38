"""Repo-local ``sitecustomize``: lazily activate the vendored protobuf shim
in every Python process that starts with this repo on its path.

Spark's ``transformWithStateInPandas`` spawns Python workers in THREE ways
(the driver-side pre-init worker via StreamingPythonRunner, daemon-forked
task workers, and non-daemon fallback workers); only daemon forks inherit
modules installed by vendor/pb_daemon.py. The interpreter imports
``sitecustomize`` at startup from anywhere on ``sys.path``, so once
``engine.get_spark`` puts the repo root on PYTHONPATH (propagated to every
worker it launches), all three worker flavors can resolve
``pyspark.sql.streaming.proto.StateMessage_pb2`` even without
``google.protobuf``.

Zero startup cost: this only registers a meta-path finder; the shim (and
pyspark itself) is imported ONLY when something actually imports the
StateMessage_pb2 module. When the real protobuf runtime is installed the
finder steps aside and the genuine generated module loads.
"""

import sys
from importlib.abc import Loader, MetaPathFinder
from importlib.machinery import ModuleSpec

_TARGET = "pyspark.sql.streaming.proto.StateMessage_pb2"


class _ShimLoader(Loader):
    def create_module(self, spec):
        from kafka_denormalization_spark.vendor import state_message_shim

        mod = state_message_shim.build_module()
        mod.__is_miniproto_shim__ = True
        return mod

    def exec_module(self, module):
        pass


class _StateMessageShimFinder(MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname != _TARGET:
            return None
        try:
            # probe a concrete submodule: a bare `import google.protobuf`
            # can succeed vacuously as an empty NAMESPACE package (any
            # google/ dir without sources on sys.path), which is exactly
            # what Spark worker environments exhibit here
            from google.protobuf import descriptor  # noqa: F401

            return None  # real runtime present — genuine pb2 wins
        except ImportError:
            pass
        try:
            return ModuleSpec(fullname, _ShimLoader())
        except Exception:  # pragma: no cover - never break imports
            return None


# idempotent across module reloads too: compare by class name, not
# identity (a reload creates a distinct class object)
if not any(type(f).__name__ == "_StateMessageShimFinder" for f in sys.meta_path):
    sys.meta_path.insert(0, _StateMessageShimFinder())
