from elb_log_to_mysql_spark.functions.casts import safe_int, safe_float  # noqa: F401
