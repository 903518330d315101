from tastytrade_sdk_spark.plans.domain_queries import (
    DOMAIN_ORACLE_SQL,
    DOMAIN_QUERIES,
)
from tastytrade_sdk_spark.plans.kernel_queries import (
    KERNEL_ORACLE_SQL,
    KERNEL_QUERIES,
)
from tastytrade_sdk_spark.plans.llm_queries import LLM_ORACLE_SQL, LLM_QUERIES
from tastytrade_sdk_spark.plans.queries import ORACLE_SQL, QUERIES

QUERIES.update(LLM_QUERIES)
ORACLE_SQL.update(LLM_ORACLE_SQL)
QUERIES.update(KERNEL_QUERIES)
ORACLE_SQL.update(KERNEL_ORACLE_SQL)
QUERIES.update(DOMAIN_QUERIES)
ORACLE_SQL.update(DOMAIN_ORACLE_SQL)

__all__ = ["ORACLE_SQL", "QUERIES"]
