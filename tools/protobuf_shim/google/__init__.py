# Namespace bridge: resolve google.* subpackages from the container's
# bundled pure-python copy (gcloud SDK appengine platform). Only the
# protobuf override directory comes first so its __init__ can patch the
# runtime-version gate.
import os as _os

_here = _os.path.dirname(_os.path.abspath(__file__))
_bundled = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
__path__ = [_here, _bundled]
