from mlx_vector_db_spark.plans.audit import explain_str, plan_has

__all__ = ["explain_str", "plan_has"]
