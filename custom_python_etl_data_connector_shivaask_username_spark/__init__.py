"""PySpark-native analytics/ETL engine.

A brand-new engine with the capability surface specified by the reference
repository ``Kyureeus-Edtech/custom-python-etl-data-connector-Shivaask-username``
(an ETL-connector assignment spec — Extract from REST APIs, Transform for
document-store compatibility, Load with ingestion timestamps and validation;
see ``/root/reference/README.md:21-34``), re-expressed Spark-first on the
DataFrame / SQL / Catalyst / Structured Streaming stack, plus the analytical
query surface (joins, aggregations, windows) and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) required for
100 TB-scale training-data work.

Layout:
    session.py    - tuned SparkSession builders
    tables.py     - fixture-table loaders + SQL view registration
    registry.py   - query/oracle registry (the driver contract)
    compat.py     - cross-engine deterministic aggregate helpers
    operators/    - relational + analytical operators (each registers queries)
    sources/      - connector I/O: REST API source, pagination, rate limiting
    functions/    - scalar/vector/text function surface
    plans/        - plan inspection & scale-tuning utilities
    streaming/    - Structured Streaming operators (windows, watermarks, state)
"""

__version__ = "0.1.0"
