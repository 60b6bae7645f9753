from elb_log_to_mysql_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    plan_report,
)
