"""§2.10 UDF-surface pins: F1 scalar UDF, F2 Arrow-batched pandas UDF,
F6 SQL registration. (F3/F4 are oracle-checked registry queries in
operators/udf_queries.py; F5 UDTFs in test_multimodal_udtf.py.)"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.operators.udf_queries import (
    make_relu_udf,
    register_scalar_udfs,
)


def test_scalar_udf_registered_for_sql(spark):
    # F1 + F6: scalar Python UDF exposed to the SQL entry point
    register_scalar_udfs(spark)
    spark.createDataFrame(
        [Row(source="src7"), Row(source="src19"), Row(source=None)]
    ).createOrReplaceTempView("udf_probe")
    got = {
        r["o"]
        for r in spark.sql(
            "SELECT src_ordinal(source) AS o FROM udf_probe"
        ).collect()
    }
    assert got == {7, 19, None}


def test_pandas_udf_arrow_batched(spark):
    # F2: vectorized scalar pandas UDF (iterator form)
    relu = make_relu_udf()
    df = spark.createDataFrame(
        [Row(x=-1.5), Row(x=0.0), Row(x=2.25)]
    ).select(relu(F.col("x")).alias("y"))
    assert [r["y"] for r in df.orderBy("y").collect()] == [0.0, 0.0, 2.25]


def test_grouped_agg_udaf_matches_builtin_mean(spark):
    # F3 sanity: the fsum-based UDAF equals the exact mean on clean data
    @F.pandas_udf("double")
    def mean_fsum(v: pd.Series) -> float:
        import math

        return round(math.fsum(v) / len(v), 6)

    df = spark.createDataFrame(
        [Row(g=1, v=1.25), Row(g=1, v=2.75), Row(g=2, v=10.0)]
    )
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(mean_fsum("v").alias("m")).collect()
    }
    assert got == {1: 2.0, 2: 10.0}
