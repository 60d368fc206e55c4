from .corpus import curate, curation_flags, funnel  # noqa: F401
