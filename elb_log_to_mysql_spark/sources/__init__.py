from elb_log_to_mysql_spark.sources.tables import load_tables  # noqa: F401
from elb_log_to_mysql_spark.sources.alb import (  # noqa: F401
    read_alb_logs,
    parse_alb_lines,
)
