"""elb_log_to_mysql_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capability surface of the
reference ETL (``prxttyfaith/elb-log-to-mysql``): AWS ALB access-log
ingest (S3 gzip text -> parsed, typed table -> JDBC sink), extended
into a full relational + LLM-data-pipeline operator set (joins, aggs,
windows, dedup, similarity search, text analysis, streaming) designed
for 100 TB scale on a multi-executor cluster.

Everything is expressed through the DataFrame/SQL API so Catalyst and
Tungsten drive the physical plan; Python UDFs appear only where the
semantics genuinely cannot be expressed with built-in expressions
(user-agent classification, MinHash banding) and are Arrow-vectorized.
"""

__version__ = "0.1.0"
