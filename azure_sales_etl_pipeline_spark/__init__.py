"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``gia-baonguyen/azure-sales-etl-pipeline`` reference.

Subpackages
-----------
- ``session``    : SparkSession factory with scale-conscious defaults.
- ``sources``    : readers/writers (CSV infer/pin lifecycle, parquet layers,
                   schema-evolving append, JDBC-shaped incremental extract).
- ``operators``  : engine machinery — watermark store, hash-diff SCD2 upsert,
                   dedup family, similarity search, text analysis, multimodal.
- ``functions``  : reusable column expressions (hash-diff, date hierarchy,
                   safe ratios, vector math).
- ``plans``      : the query library — every entry in the driver contract's
                   ``queries()`` registry, grouped by domain.
- ``streaming``  : Structured Streaming variants of the incremental operators.
- ``pipeline``   : the medallion orchestrator (Landing->Bronze->Silver->Gold).
"""

__version__ = "0.1.0"
