"""mapshaper_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch reimplementation of the query/data-processing capabilities of
mapshaper (reference at /root/reference, cited per module) as
ray.data.Dataset pipelines over zero-copy Arrow batches, plus the
large-scale training-data operators (dedup, ANN, text analysis) the
100TB-scale mission requires.
"""

__version__ = "0.1.0"

from . import _quiet  # noqa: F401,E402  (installs the benign-Ray-warning filter)
