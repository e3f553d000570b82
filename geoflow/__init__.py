"""geoflow — Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the codec capabilities of district10/geobuf-cpp
(reference, read-only at /root/reference) scaled out over Ray Data per
BASELINE.json's north rule.  See SURVEY.md for the blueprint and README.md
for the map of modules.
"""

__version__ = "0.1.0"
