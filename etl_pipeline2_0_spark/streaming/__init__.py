from etl_pipeline2_0_spark.streaming.watch import run_watch_mode

__all__ = ["run_watch_mode"]
