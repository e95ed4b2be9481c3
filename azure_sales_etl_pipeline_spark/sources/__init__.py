"""Sources: the Landing→Bronze ingestion surface (SURVEY.md S1-S2,
S5-S6, S10-S12, F1-F2) re-expressed on plain Spark.

- ``ingest``  : CSV discovery + infer-then-pin schema lifecycle + audit
                columns + schema-evolving append
- ``extract`` : watermark-windowed incremental extract (the ADF Copy
                activity's SELECT-WHERE window, S11/F12) over any
                DataFrame-producing reader — JDBC when a URL is given,
                file formats always
"""

from .extract import incremental_extract
from .ingest import CsvIngestor

__all__ = ["CsvIngestor", "incremental_extract"]
