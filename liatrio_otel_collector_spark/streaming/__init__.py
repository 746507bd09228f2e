from .job import StreamingConfig, start_stream  # noqa: F401
