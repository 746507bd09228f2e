from . import aggregates, windows, setops, dedup, similarity, textstats  # noqa: F401
