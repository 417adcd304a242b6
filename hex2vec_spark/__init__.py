"""hex2vec_spark: PySpark-native spatial-join + H3 tiling engine.

From-scratch re-expression of kraina-ai/hex2vec's hexagon pipeline
(OSM-tag hexagon embedding prep) as an idiomatic Spark engine over an
Iceberg-style table of image + caption pairs. See SURVEY.md for the
operator inventory and the file:line parity citations.
"""

__version__ = "0.1.0"
