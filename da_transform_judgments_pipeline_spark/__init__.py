"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of nationalarchives/da-transform-judgments-pipeline (TRE).

Built Spark-first: DataFrame/SQL logical plans optimized by Catalyst, a thin
binary/UDF layer for archive handling, and driver-side orchestration that
reproduces the reference's state-machine semantics (SURVEY.md §2, §7).

Subpackages
-----------
sources    : scans/sinks — file catalog, manifests, bag-info, CSV, archives
functions  : scalar expression helpers (strings, paths, checksums, json)
operators  : relational + data-pipeline operators (DRI SIP transform,
             validation joins, dedup, similarity, text analysis, multimodal)
plans      : event envelope + pipeline stages + orchestrator
streaming  : structured-streaming front end (trigger, dedup, retry, DLQ)
"""

__version__ = "0.1.0"
