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

# Eager import: polars populates its lazy `_reexport` module during
# `import polars`; if that first import happens inside a Ray task under
# load it can be left partially initialized and every later call in the
# worker dies with `module 'polars._reexport' has no attribute 'Series'`
# (observed flakily at 800k-page scale).  Importing here — when the
# worker unpickles its first geoflow UDF — makes initialization happen
# once, completely, before any task body touches polars.
import polars as _polars  # noqa: E402,F401

__version__ = "0.1.0"
