"""fetch-engines-spark: a PySpark-native main-content extraction engine.

Brand-new build (not a port) reproducing the extraction behavior of the
reference TypeScript engine (purepage/fetch-engines) over Spark DataFrames
of interleaved text+media span documents.
"""

__version__ = "0.1.0"
