"""geoflow — Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the codec capabilities of district10/geobuf-cpp
(reference, read-only at /root/reference) scaled out over Ray Data per
BASELINE.json's north rule.  See SURVEY.md for the blueprint and README.md
for the map of modules.
"""

import os as _os

# Polars sizes its global thread pool to all cores at import; inside Ray
# worker processes (1 CPU per task) that oversubscribes the node by
# workers x cores threads.  Must be set before the first polars import
# anywhere in the process.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
