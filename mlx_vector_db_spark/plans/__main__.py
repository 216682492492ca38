"""Regenerate PLANS.md: ``python -m mlx_vector_db_spark.plans``."""

from mlx_vector_db_spark.plans.audit import dump_plans
from mlx_vector_db_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark("plan-dump")
    dump_plans(spark, "/root/testdata/sf0.001", "PLANS.md")
    print("wrote PLANS.md")
