"""PySpark-native analytics engine with the query and data-processing
capabilities of nestauk/ojo_daps_mirror, rebuilt Spark-first.

Nothing here is a port: the reference (a Metaflow + SQLAlchemy + row-wise
Python pipeline) defines WHAT is computed; this package re-expresses each
computation as declarative DataFrame plans optimized by Catalyst.
"""

__version__ = "0.1.0"
