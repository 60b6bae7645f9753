from elb_log_to_mysql_spark.sinks.jdbc import write_jdbc  # noqa: F401
