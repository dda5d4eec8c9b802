from timefusion_spark.sources.eventgen import EventGenDataSource, register_sources

__all__ = ["EventGenDataSource", "register_sources"]
