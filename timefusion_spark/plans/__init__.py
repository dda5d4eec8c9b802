"""Plan-construction helpers: shapes Catalyst does not produce on its own."""

from timefusion_spark.plans.defer import take_ordered_then_project

__all__ = ["take_ordered_then_project"]
