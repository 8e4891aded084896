"""Composed query plans — end-to-end pipelines built from operators."""

from full_data_infrastructure_spark.plans.flagship import flagship_benefits

__all__ = ["flagship_benefits"]
