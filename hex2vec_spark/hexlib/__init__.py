"""hexlib: pure-NumPy kernels (H3-format hex grid, geometry, image codecs).

No Spark imports here — this package is shipped to executors and used
inside Arrow pandas UDFs; keeping it Spark-free keeps it picklable and
unit-testable in isolation.
"""

from . import geom, h3core, hexmath, icosa, image  # noqa: F401
