from social_media_etl_spark.streaming import ingest, stateful  # noqa: F401
