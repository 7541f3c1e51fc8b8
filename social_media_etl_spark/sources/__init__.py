from social_media_etl_spark.sources import multimodal, rest_api  # noqa: F401
