"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference (tkmasi90/data-engineering-assignment).

The reference is a Databricks notebook of analytics pipelines
(/root/reference/Assignment-python.py); this package re-expresses its operator
surface (SURVEY.md section 2) as a reusable, idiomatic Spark-first library:

- ``session``    : tuned SparkSession factory + runtime conf pinning
- ``tables``     : typed loaders for the driver test tables
- ``schemas``    : StructTypes for the reference's own datasets
- ``operators``  : composable relational / array / dedup / similarity /
                   text / multimodal / event-window operators
- ``pipelines``  : the reference's named analytics tasks as query functions
- ``queries``    : the driver-facing catalog (queries + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
